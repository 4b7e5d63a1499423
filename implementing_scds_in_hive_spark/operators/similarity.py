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


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF index build: assign every corpus vector to its nearest
    centroid (cosine; deterministic tie-break on centroid id).

    Centroids broadcast (they are small by construction); the corpus
    streams through the scoring join once, and the per-vector argmax is
    a partitioned window — one shuffle of (vector, K scores) rows,
    map-side reducible. At 100 TB with K in the thousands this is the
    standard inverted-file build; a production system would iterate
    k-means here, which is just this assignment + a centroid-mean
    aggregation per round.
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col), F.col(vec_col).alias("__cvec")
        )
    )
    scored = corpus.crossJoin(c).select(
        id_col,
        vec_col,
        centroid_id_col,
        F.round(cosine(F.col("__cvec"), F.col(vec_col)), 6).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col(centroid_id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, vec_col, centroid_id_col)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF-probed approximate top-k: each query scores only the corpus
    vectors assigned to its ``nprobe`` nearest centroids.

    The |Q| x |C| cross join of brute force becomes (a) a tiny
    query-centroid ranking, then (b) an equi-join on centroid id against
    the assignment table — the corpus shuffles once on centroid id (or
    not at all if the index is pre-bucketed by centroid on disk, the
    physical layout an IVF index file encodes). Recall loss is confined
    to neighbors whose centroid the probe misses — the standard IVF
    trade; raise ``nprobe`` to trade compute back for recall."""
    assigned = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col, centroid_id_col=centroid_id_col
    )
    c = F.broadcast(
        centroids.select(F.col(centroid_id_col), F.col(vec_col).alias("__cvec"))
    )
    q_scored = queries.crossJoin(c).select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        centroid_id_col,
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("__sim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__sim").desc(), F.col(centroid_id_col))
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qvec", centroid_id_col)
    )
    scored = assigned.join(F.broadcast(probes), centroid_id_col).select(
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
