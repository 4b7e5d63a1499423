"""Deduplication operators for large-scale text corpora.

Four tiers, ordered by cost/recall trade-off (all shuffle on content-
derived keys, never on raw document text except where noted):

* exact           — md5 fingerprint group-by; one shuffle of (hash, id)
* ngram_jaccard   — EXACT Jaccard over word n-gram shingles via an
                    inverted shingle index (pairs sharing >= 1 shingle);
                    exhaustive but the shingle join can blow up on very
                    common shingles — cap with a document-frequency
                    filter at scale
* minhash_lsh     — MinHash signatures + banded LSH bucketing; candidate
                    pairs verified with exact Jaccard. Sub-quadratic:
                    the only join is on (band, bucket-hash)
* simhash         — 64-bit SimHash; near-dup candidates = identical
                    simhash (or banded prefixes)

Spark-first notes: MinHash permutations are xxhash64(seed, shingle) —
no Python in the hot path; signatures are built by a single groupBy
with ``min(hash)`` per permutation expressed as array aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.text import fingerprint, shingles
from implementing_scds_in_hive_spark.sources.registry import spread


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: returns
    (fingerprint, group size, member ids sorted) for groups > 1."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("members"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group."""
    w_min = F.min(id_col).alias("keep_id")
    keep = (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(w_min)
        .select("keep_id")
    )
    return docs.join(keep, docs[id_col] == keep.keep_id, "left_semi")


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return spread(docs).select(
        F.col(id_col).alias("did"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    ).where(F.size("sh") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing a shingle.

    Inverted-index self-join: explode distinct shingles, join on the
    shingle, count intersections per pair; |union| = |A| + |B| - |inter|.
    ``max_doc_freq`` drops ubiquitous shingles (stop-gram suppression) —
    at 100 TB this is essential to bound the join fan-out; left None
    here because the oracle must be exhaustive.
    """
    from pyspark.storagelevel import StorageLevel

    # 4 downstream consumers (sizes + both sides of the self-join);
    # persist or Spark re-runs the shingling for each
    sh = _shingled(docs, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.select("did", F.size("sh").alias("sz"))
    inv = sh.select("did", F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        inv = inv.join(freq.where(F.col("df") <= max_doc_freq), "shingle", "left_semi")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("did").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("did").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """MinHash signature per document: permutation i is
    xxhash64(i, xxhash64(shingle)) — the string is hashed once, each
    permutation then hashes a single bigint; the signature element is the
    min over shingles."""
    sh = _shingled(docs, id_col, text_col, n)
    return minhash_signatures_from_shingles(sh, num_perm=num_perm)


def minhash_signatures_from_shingles(sh: DataFrame, *, num_perm: int = 32) -> DataFrame:
    # explode + groupBy-min beats a per-row lambda aggregate: the mins
    # run as vectorized partial aggregations inside whole-stage codegen
    # (map-side combine shrinks the shuffle to one row per doc).
    exploded = sh.select(
        "did", F.size("sh").alias("sz"), F.explode("sh").alias("shingle")
    ).select("did", "sz", F.xxhash64("shingle").alias("hs"))
    mins = [F.min(F.xxhash64(F.lit(i), F.col("hs"))).alias(f"_m{i}") for i in range(num_perm)]
    agg = exploded.groupBy("did", "sz").agg(*mins)
    return agg.select(
        "did", "sz", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified exactly.

    Candidate generation: hash each band (num_perm/bands signature rows)
    to a bucket; pairs colliding in >= 1 band are candidates. With 32
    perms / 8 bands (r=4) the detection probability at J=0.8 is
    1-(1-0.8^4)^8 ≈ 0.99. Candidates are then verified with exact
    Jaccard on the shingle sets, so precision is 1.0; recall is the LSH
    probability above. The shuffle moves only (bucket, id) pairs —
    sub-quadratic versus the exhaustive inverted index.
    """
    from pyspark.storagelevel import StorageLevel

    rows_per_band = num_perm // bands
    # Flat (doc, shingle-hash) table is the single persisted intermediate
    # — two bigints per shingle, far smaller than shingle-string arrays,
    # and every downstream stage (sizes, signatures, verification) is a
    # plain hash-agg/join over it. Persisting bulky string arrays and
    # verifying with array_intersect measured 3-4x slower.
    sh = _shingled(docs, id_col, text_col, n)
    flat = (
        sh.select("did", F.explode("sh").alias("shingle"))
        .select("did", F.xxhash64("shingle").alias("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = flat.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    mins = [F.min(F.xxhash64(F.lit(i), F.col("hs"))).alias(f"_m{i}") for i in range(num_perm)]
    sig = flat.groupBy("did").agg(*mins)
    banded = sig.select(
        "did",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col(f"_m{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("did", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verification restricted to candidates: intersection
    # size = matched hash count through two joins against the flat table
    # (candidate set is small, so these joins touch a sliver of flat).
    fa = flat.select(F.col("did").alias("id_a"), "hs")
    fb = flat.select(F.col("did").alias("id_b"), "hs")
    inter = (
        cand.join(fa, "id_a")
        .join(fb, ["id_b", "hs"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("did").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("did").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document from word-token hashes.

    For each bit position, sum +1/-1 over token hashes and take the
    sign. Expressed as one aggregate over the token array per bit —
    narrow, codegen-friendly, no shuffle at all."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    docs = spread(docs)

    def bit_sum(i: int):
        def merge(acc, t):
            bit = F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(toks, F.lit(0), merge)

    bit_sums = [bit_sum(i) for i in range(64)]
    sim = None
    for i, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return docs.select(F.col(id_col).alias("did"), sim.alias("simhash"))


def simhash_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents whose full 64-bit SimHash collides (hamming distance 0;
    banded prefixes generalize to distance > 0)."""
    sh = simhash64(docs, id_col, text_col)
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list("did")).alias("members"))
        .where(F.col("n_docs") > 1)
    )
