"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the full corpus; per-query ranking via window. One scan of
  the corpus, no corpus shuffle except the top-k aggregation. This is
  the correctness baseline and the right plan whenever |queries| is
  small (the broadcast side) regardless of corpus size.
* ``lsh_bucketed_topk`` — the scale path: sign-bit LSH blocking prunes
  the corpus per query before exact scoring. Approximate (a true
  neighbor in another bucket is missed) — used when brute force's
  |Q|x|C| score matrix is too large.

Scores are computed with built-in array ops in double precision (no
Python UDFs); rounding to 6 decimals makes cross-engine comparison
stable without materially affecting ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.vectors import cosine, sign_bits_bucket


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    )
    scored = corpus.crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket, then scored exactly. Equi-join on the bucket key replaces the
    cross join — the corpus shuffles once on bucket, queries broadcast."""
    c = corpus.withColumn("__bucket", sign_bits_bucket(F.col(vec_col), n_bits))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        )
    )
    scored = c.join(q, "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) with sign-bit
    LSH blocking: only pairs in the same bucket are scored."""
    b = corpus.select(
        F.col(id_col), F.col(vec_col), sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
