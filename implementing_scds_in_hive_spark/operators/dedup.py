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

Spark-first notes: everything is JVM-side built-ins — no Python in any
hot path. Token arrays are materialized in a projection BEFORE any
higher-order function touches them: an expression like
``element_at(split(text), i)`` inside a ``transform`` lambda re-evaluates
the split per element (no common-subexpression elimination across lambda
invocations), turning shingling O(tokens^2) per document. Shingle
identity is a 64-bit hash combined numerically with ``zip_with`` over
slice-shifted token-hash arrays — no per-shingle string allocation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from implementing_scds_in_hive_spark.functions.text import fingerprint
from implementing_scds_in_hive_spark.sources.registry import spread

# Recommended stop-gram cap for the exhaustive n-gram tier at scale
# (ngram_jaccard_pairs max_doc_freq) — pass it EXPLICITLY at scale call
# sites; the entry point itself defaults to None (exact) because a
# silent cap makes both the pair set and the jaccard values (sizes are
# counted post-suppression) corpus-dependent approximations under an
# 'Exact' contract (r12 ADVICE). Chosen from the sf0.1 sweep
# (scripts/dedup_scale_smoke.py; PLANS.md "Dedup tiers at scale"):
# caps >= 50 lose zero true pairs on the driver corpus; 100 keeps 2x
# margin while bounding any one shingle's join fan-out to ~100^2/2
# candidate pairs regardless of corpus size. For a cap-free bounded
# exact run use jaccard_prefix_pairs (prefix filtering — lossless).
DEFAULT_MAX_DOC_FREQ = 100


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: returns
    (fingerprint, group size, member ids sorted) for groups > 1.
    NULL text is UNKNOWN, not identical — groupBy compares NULLs equal,
    so unfiltered it would report every failed-extraction row as one
    giant bogus duplicate group (r11 review); they are excluded."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("members"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group.
    NULL-text documents are never duplicates of each other (unknown !=
    unknown) — ALL of them are kept; previously the NULL fingerprint
    formed one group and silently dropped all but one (r11 review)."""
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keep = (
        fp.where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"))
        .select("keep_id")
        .unionByName(
            fp.where(F.col("fp").isNull()).select(
                F.col(id_col).alias("keep_id")
            )
        )
    )
    return docs.join(keep, docs[id_col] == keep.keep_id, "left_semi")


def portable_token_hash(t: Column) -> Column:
    """60-bit integer token hash replayable on any ANSI engine:
    the first 15 hex chars of md5, parsed base-16. DuckDB twin:
    ``CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)``. Slower than
    xxhash64 (string md5 + base conversion per token) — used where
    cross-engine verification matters more than throughput (the driver's
    simhash correctness query); xxhash64 stays the scale default."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")


def _token_hashes(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    token_hash=F.xxhash64,
    *,
    min_tokens: int = 0,
) -> DataFrame:
    """(id, th: array<bigint>) — one hash per token, materialized so
    downstream higher-order functions never re-tokenize.

    ``min_tokens`` filters short documents BEFORE the hash projection, on
    the raw split length. Filtering here matters: a filter placed ABOVE a
    projection that derives from ``th`` gets predicate-pushed below it,
    and the pushdown substitutes the full tokenize+hash expression into
    the condition — and, fatally, into any lambda that accesses ``th``
    by element, re-evaluating the whole token hash per element access
    (measured 46s vs 1.4s on sf0.1 documents). Pre-filtering on
    ``size(split(...))`` costs one split per row and keeps every
    downstream reference to ``th`` a plain column."""
    base = spread(docs)
    if min_tokens > 0:
        base = base.where(F.size(F.split(F.col(text_col), " ")) >= min_tokens)
    return base.select(
        F.col(id_col).alias("did"),
        F.transform(F.split(F.col(text_col), " "), lambda t: token_hash(t)).alias("th"),
    )


def _shingle_hashes(th: Column, n: int) -> Column:
    """n-gram shingle hashes from a token-hash array: one transform over
    the start-index sequence, folding the n positions with element_at —
    O(tokens * n) with a single output array. (The earlier formulation —
    n slice-shifted copies pairwise zip_with'd — allocated 2n-1
    intermediate arrays per document and measured 2x slower; identical
    values, since both fold left: hash(hash(h_i, h_i+1), h_i+2).)
    ``th`` must be a materialized column reference, not a computed
    expression — element_at inside the lambda would re-evaluate it per
    shingle (no CSE across lambda invocations)."""
    m = F.size(th) - (n - 1)
    def shingle(i: Column) -> Column:
        acc = F.element_at(th, i)
        for j in range(1, n):
            acc = F.xxhash64(acc, F.element_at(th, i + F.lit(j)))
        return acc
    return F.when(m > 0, F.transform(F.sequence(F.lit(1), m), shingle)).otherwise(
        F.array().cast("array<bigint>")
    )


def shingled_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", *, n: int = 3
) -> DataFrame:
    """(did, sh: sorted array<bigint> of distinct shingle hashes).
    Documents with < n tokens (no shingles) are excluded — via the
    pre-hash token-count filter, NOT a post-hoc ``size(sh) > 0`` filter,
    which would predicate-push the whole shingle expression (see
    _token_hashes)."""
    return _token_hashes(docs, id_col, text_col, min_tokens=n).select(
        "did", F.array_sort(F.array_distinct(_shingle_hashes(F.col("th"), n))).alias("sh")
    )


def _pin_reused(
    df: DataFrame, cache_handles: list[DataFrame] | None
) -> DataFrame:
    """Materialize an intermediate that downstream code references more
    than once. Default: ``localCheckpoint(eager=True)`` — blocks are
    released when the DataFrame is GC'd, so repeated batch callers
    cannot accumulate session-lifetime executor storage (the r11/r12
    leak class).

    Fault-tolerance tradeoff (r12 ADVICE): ``localCheckpoint`` TRUNCATES
    lineage and stores blocks unreplicated on executors, so losing any
    executor mid-job makes the pinned intermediate unrecoverable and
    aborts the job — acceptable on local[n] and for short batches, NOT
    for multi-hour 100 TB runs on preemptible hardware. For those,
    either pass ``cache_handles`` (plain ``persist(MEMORY_AND_DISK)``
    keeps lineage, so lost blocks recompute; handles are appended for
    the caller to unpersist on its own schedule), or set a RELIABLE
    checkpoint dir (``spark.sparkContext.setCheckpointDir`` on
    HDFS/object storage) — when one is set, the default path uses
    ``checkpoint`` (replicated, survives executor loss) instead. Note
    reliable-checkpoint files are only auto-reclaimed when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``;
    otherwise sweep the checkpoint dir on the job's own schedule."""
    if cache_handles is not None:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        cache_handles.append(df)
        return df
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing a shingle.

    Inverted-index self-join: explode distinct shingles, join on the
    shingle, count intersections per pair; |union| = |A| + |B| - |inter|.
    ``max_doc_freq`` drops ubiquitous shingles (stop-gram suppression).
    The default is ``None`` — EXACT, honoring the tier's contract on
    any corpus (r12 ADVICE: a capped default silently shifts both the
    pair SET and the jaccard VALUES off-corpus, since |A|/|B| are
    counted post-suppression). At 100 TB a cap is essential to bound
    the join fan-out: pass ``DEFAULT_MAX_DOC_FREQ`` (=100) explicitly —
    the sf0.1 sweep (scripts/dedup_scale_smoke.py, numbers in PLANS.md)
    shows caps >= 50 lose zero true pairs on the driver corpus while
    any cap bounds the worst-case per-shingle fan-out to cap^2/2 pairs
    — and treat the result as approximate off the proven corpus; or use
    ``jaccard_prefix_pairs`` for the LOSSLESS bounded scale path.

    Reused intermediates are ``localCheckpoint``-ed by default (blocks
    are released when the DataFrame is GC'd — no session-lifetime
    executor-storage leak); pass ``cache_handles`` to get plain
    ``persist`` with the handles appended for the caller to unpersist.
    """

    sh = _pin_reused(shingled_hashes(docs, id_col, text_col, n=n), cache_handles)
    inv = sh.select("did", F.explode("sh").alias("hs"))
    if max_doc_freq is not None:
        freq = inv.groupBy("hs").agg(F.count(F.lit(1)).alias("df"))
        # the suppressed index is referenced FOUR times below (a, b,
        # and sizes joined as sz_a/sz_b) — unpinned, the full-corpus
        # frequency aggregation + semi-join would re-execute per
        # reference, on exactly the path the cap exists to make
        # 100 TB-viable (r11 review)
        inv = _pin_reused(
            inv.join(freq.where(F.col("df") <= max_doc_freq), "hs", "left_semi"),
            cache_handles,
        )
        # Consistency is load-bearing: |A| and |B| must count the SAME
        # shingle universe the intersection does, i.e. post-suppression.
        # Sizing with the full arrays while intersecting only surviving
        # shingles biases Jaccard down — measured at 50k docs (10x
        # replicated corpus, PLANS.md r4): full-size denominators drove
        # recall to ZERO at cap=100 where consistent sizing keeps it.
        sizes = inv.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    else:
        sizes = sh.select("did", F.size("sh").alias("sz"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.hs") == F.col("b.hs")) & (F.col("a.did") < F.col("b.did")))
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
    backend: str = "builtin",
) -> DataFrame:
    """MinHash signature per document: permutation i is
    xxhash64(i, shingle-hash); the signature element is the min over
    shingles. Computed shuffle-free with array_min over the in-row
    shingle array — no explode, no groupBy.

    ``backend="arrow"`` (default, r15) batches the num_perm x |sh|
    interpreted lambda tower into vectorized uint64 passes per Arrow
    batch (operators/hash_kernels.py — bit-exact xxhash64 replay,
    pinned against F.xxhash64); the leaf token/string hashing stays in
    the codegen'd scan either way. ``backend="builtin"`` keeps the
    pure-JVM expression."""
    sh = shingled_hashes(docs, id_col, text_col, n=n)
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.hash_kernels import (
            minhash_sig,
        )

        return minhash_sig(sh, num_perm=num_perm)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform("sh", lambda h: F.xxhash64(i, h))),
    )
    return sh.select("did", F.size("sh").alias("sz"), sig.alias("sig"))


def _band_buckets(num_perm: int, bands: int) -> Column:
    """array<struct<band, bucket>> from an in-row ``sig`` array: bucket =
    xxhash64 of the band's signature rows. One expression, no
    intermediate signature columns."""
    rows_per_band = _validate_lsh_params(num_perm, bands)
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def _verify_candidates(sh: DataFrame, banded: DataFrame, threshold: float) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification, shared by
    both hash families: self-join ``banded`` on (band, bucket), then pull
    the candidate pairs' shingle arrays and intersect in-row."""
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
    sh_a = sh.select(F.col("did").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("did").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
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
    cache_handles: list[DataFrame] | None = None,
    backend: str = "builtin",
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified exactly.

    Candidate generation: hash each band (num_perm/bands signature rows)
    to a bucket; pairs colliding in >= 1 band are candidates. With 32
    perms / 8 bands (r=4) the detection probability at J=0.8 is
    1-(1-0.8^4)^8 ≈ 0.99. Candidates are then verified with exact
    Jaccard on the shingle-hash sets, so precision is 1.0; recall is the
    LSH probability above.

    Plan shape: ONE persisted per-document array table (did, sh) feeds
    everything; signatures and band buckets are in-row expressions (no
    explode/groupBy); the only shuffles are the (band, bucket) self-join
    on candidate generation — tiny rows — and the candidate verification
    joins, which pull the shingle arrays of the (few) candidate pairs and
    intersect them in-row with array_intersect on sorted arrays.
    """
    sh = _pin_reused(
        shingled_hashes(docs, id_col, text_col, n=n), cache_handles
    )
    if backend == "arrow":
        # the interpreted num_perm x |sh| tower plus the per-band
        # bucket fold become one map-only Arrow pass (hash_kernels;
        # r15 — same plan otherwise, the signature/banding stage had
        # no exchange in either backend)
        from implementing_scds_in_hive_spark.operators.hash_kernels import (
            minhash_banded,
        )

        banded = minhash_banded(
            sh,
            num_perm=num_perm,
            bands=bands,
            rows_per_band=_validate_lsh_params(num_perm, bands),
        )
    else:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.array_min(F.transform("sh", lambda h: F.xxhash64(i, h))),
        )
        banded = (
            sh.select("did", sig.alias("sig"))
            .select("did", F.explode(_band_buckets(num_perm, bands)).alias("bb"))
            .select("did", "bb.band", "bb.bucket")
        )
    return _verify_candidates(sh, banded, threshold)


# --- portable (cross-engine replayable) MinHash family ---------------------
#
# Everything below is plain mod-p integer arithmetic over a Mersenne
# prime, so any ANSI engine can replay signatures, buckets, and therefore
# the exact candidate set: token hash = md5-prefix (portable_token_hash)
# reduced mod p; shingles fold token hashes with an affine combine;
# permutation i is the affine map s -> (a_i*s + b_i) mod p. All operands
# stay < 2^31, so every product fits in a 64-bit signed int — no
# overflow under Spark ANSI mode, identical values in DuckDB. xxhash64
# (above) stays the scale default: one JVM hash call vs md5 + base-16
# parse per token.

PORTABLE_P = 2_147_483_647  # Mersenne prime 2^31 - 1
_COMBINE_A = 1_000_003


def _pcombine(x: Column, y: Column) -> Column:
    return (x * F.lit(_COMBINE_A) + y) % F.lit(PORTABLE_P)


def portable_shingled_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", *, n: int = 3
) -> DataFrame:
    """(did, sh) with shingle hashes in the portable mod-p family."""
    th = _token_hashes(
        docs,
        id_col,
        text_col,
        lambda t: portable_token_hash(t) % F.lit(PORTABLE_P),
        min_tokens=n,
    )
    return th.select(
        "did",
        F.array_sort(F.array_distinct(portable_shingle_hashes(F.col("th"), n))).alias("sh"),
    )


def portable_shingle_hashes(th: Column, n: int) -> Column:
    """Non-distinct n-gram shingle hashes (portable family) from a
    MATERIALIZED token-hash array — the mod-p twin of _shingle_hashes,
    same single-pass fold and the same element_at caveat."""
    m = F.size(th) - (n - 1)

    def shingle(i: Column) -> Column:
        acc = F.element_at(th, i)
        for j in range(1, n):
            acc = _pcombine(acc, F.element_at(th, i + F.lit(j)))
        return acc

    return F.when(m > 0, F.transform(F.sequence(F.lit(1), m), shingle)).otherwise(
        F.array().cast("array<bigint>")
    )


def _validate_lsh_params(num_perm: int, bands: int) -> int:
    """``rows_per_band`` with the family contract enforced: bands must
    divide num_perm (trailing permutations would otherwise silently
    drop, breaking the documented 1-(1-t^r)^b detection probability)
    and rows_per_band must be >= 1 (bands > num_perm degenerates the
    portable tier to single-permutation buckets replicated per band —
    r11 review)."""
    if bands < 1 or bands > num_perm or num_perm % bands != 0:
        raise ValueError(
            f"bands={bands} must be in [1, num_perm] and divide "
            f"num_perm={num_perm} exactly — the banded detection "
            f"probability 1-(1-t^r)^b assumes r = num_perm/bands with "
            f"no dropped permutations"
        )
    return num_perm // bands


def _portable_band_array(num_perm: int, bands: int, sig_col: str = "__sig"):
    """The band->bucket struct array over a materialized signature
    column — THE single source of truth for band numbering/assembly:
    portable_minhash_lsh_pairs and portable_minhash_index both build
    from this expression, so an incremental probe against a saved
    index can never diverge from the full-corpus path (r11 review:
    the assembly was previously copy-pasted)."""
    rows_per_band = _validate_lsh_params(num_perm, bands)
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _portable_bucket(F.col(sig_col), b, rows_per_band).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
    )


def portable_minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """``minhash_lsh_pairs`` with the portable hash family — same plan
    shape (in-row signatures/buckets, (band, bucket) join, exact verify),
    deterministic across engines, so a SQL oracle can replay it
    value-for-value."""
    _validate_lsh_params(num_perm, bands)
    sh = _pin_reused(
        portable_shingled_hashes(docs, id_col, text_col, n=n), cache_handles
    )
    banded = (
        sh.select("did", _portable_sig(num_perm).alias("__sig"))
        .select(
            "did",
            F.explode(_portable_band_array(num_perm, bands)).alias("bb"),
        )
        .select("did", "bb.band", "bb.bucket")
    )
    return _verify_candidates(sh, banded, threshold)


def _portable_sig(num_perm: int) -> Column:
    """In-row portable MinHash signature from a materialized ``sh``
    column (same affine permutation family as
    ``portable_minhash_lsh_pairs`` — oracle-replayable)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                "sh",
                lambda s: ((F.lit(13) + F.lit(97) * i) * s + (F.lit(7) + F.lit(40503) * i))
                % F.lit(PORTABLE_P),
            )
        ),
    )


def _portable_bucket(sig_col: Column, b: int, rows_per_band: int) -> Column:
    acc = F.element_at(sig_col, b * rows_per_band + 1)
    for r in range(1, rows_per_band):
        acc = _pcombine(acc, F.element_at(sig_col, b * rows_per_band + r + 1))
    return acc


def portable_minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Materialized MinHash LSH index — ONE row per document:
    (did, sh, bb: array<struct<band, bucket>>). This is the artifact a
    100 TB corpus persists once (partitioned/bucketed by a bucket
    projection) so that each incoming delta batch can be deduplicated
    against the corpus WITHOUT re-reading corpus text or recomputing
    corpus signatures: dedup cost becomes O(batch + touched buckets),
    not O(corpus). All expressions in-row, zero shuffles to build."""
    sh = portable_shingled_hashes(docs, id_col, text_col, n=n)
    # Materialize the signature in its own projection FIRST: the bucket
    # expressions below reference it 4×/band × 8 bands, and an inlined
    # sig expression would re-run all num_perm permutation scans per
    # reference (higher-order functions get no cross-expression CSE —
    # measured 60× slower inlined).
    with_sig = sh.select("did", "sh", _portable_sig(num_perm).alias("__sig"))
    return with_sig.select(
        "did", "sh", _portable_band_array(num_perm, bands).alias("bb")
    )


def incremental_minhash_pairs(
    corpus_index: DataFrame,
    new_index: DataFrame,
    *,
    threshold: float = 0.8,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN a persisted corpus index and a new batch's
    index (both from ``portable_minhash_index``): explode band buckets
    on both sides, equi-join on (band, bucket), verify candidates with
    exact Jaccard over the stored shingle arrays. Returns
    (id_a = corpus doc, id_b = new doc, jaccard).

    Scale shape: the new batch is small — its exploded buckets
    broadcast, so the candidate join streams the corpus index map-side
    (and prunes to touched buckets when the index is stored bucketed).
    Only candidate pairs' shingle arrays are pulled for verification.
    Intra-batch duplicates are a separate (tiny) self-join:
    ``portable_minhash_lsh_pairs`` over the batch alone.

    ``corpus_index`` must be a MATERIALIZED artifact (a persisted
    DataFrame or a table read back from storage) — that is its whole
    point. ``new_index`` is persisted here if the caller hasn't: it is
    referenced three times (bucket burst, broadcast, shingle pull), and
    as a live expression plan each reference re-inlines the full
    signature expression through the explode (no CSE across
    higher-order functions — the same trap the index builder documents).
    Measured on a 500-doc delta against a 50k-doc corpus: 147 s
    unpersisted vs 0.9 s persisted. When ``cache_handles`` is provided
    the persisted handle is appended so batch drivers control the
    unpersist; when omitted, the batch is ``localCheckpoint``-ed
    instead — checkpoint blocks are released by Spark's ContextCleaner
    once the DataFrames are garbage-collected, so a long-lived session
    processing many deltas does not accumulate pinned cache blocks."""

    if new_index.storageLevel == StorageLevel.NONE:
        if cache_handles is not None:
            new_index = new_index.persist(StorageLevel.MEMORY_AND_DISK)
            cache_handles.append(new_index)
        else:
            new_index = new_index.localCheckpoint(eager=True)

    def burst(ix: DataFrame, side: str) -> DataFrame:
        return ix.select(
            F.col("did").alias(f"id_{side}"), F.explode("bb").alias("bb")
        ).select(f"id_{side}", "bb.band", "bb.bucket")

    cand = (
        burst(corpus_index, "a")
        .join(F.broadcast(burst(new_index, "b")), ["band", "bucket"])
        # a batch re-ingesting a doc id the corpus already holds would
        # otherwise emit the degenerate self-pair (X, X, 1.0) — and a
        # downstream "drop id_b" policy would delete the only copy
        # (r11 review; the stream guards this with an anti-join, direct
        # callers get the guard here)
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = corpus_index.select(F.col("did").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = new_index.select(F.col("did").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(F.broadcast(sh_b), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    token_hash=F.xxhash64,
) -> DataFrame:
    """64-bit SimHash per document from distinct word-token hashes.

    Explode token hashes, then one vectorized hash-aggregation computes
    all 64 per-bit +1/-1 sums (map-side combine shrinks the shuffle to
    one row per document); the final hash assembles sign bits with
    literal shifts. The earlier formulation — 64 F.aggregate lambdas each
    re-hashing every token — was O(64 * tokens) re-computation inside one
    projection and dominated the plan's codegen size.
    """
    toks = _token_hashes(docs, id_col, text_col, token_hash).select(
        "did", F.explode(F.array_distinct("th")).alias("h")
    )
    sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("did").agg(*sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return agg.select("did", sim.alias("simhash"))


def simhash_duplicate_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    token_hash=F.xxhash64,
    prefix_bits: int = 64,
) -> DataFrame:
    """Documents whose SimHash collides on the top ``prefix_bits`` bits.

    ``prefix_bits=64`` (default) is exact collision (hamming distance
    0). Smaller values are ONE BAND of the standard banded near-dup
    scheme: grouping on the high ``prefix_bits`` tolerates any hamming
    distance confined to the low ``64 - prefix_bits`` bits — a full
    B-band sweep unions the groups of each band rotation. The band key
    is a LOGICAL right shift (non-negative), so engines agree on the
    grouping value regardless of their ``>>`` sign semantics."""
    if not 1 <= prefix_bits <= 64:
        raise ValueError(
            f"prefix_bits must be in [1, 64], got {prefix_bits}"
        )
    sh = simhash64(docs, id_col, text_col, token_hash=token_hash)
    key = (
        F.col("simhash")
        if prefix_bits == 64
        else F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )
    return (
        sh.groupBy(key.alias("simhash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list("did")).alias("members"))
        .where(F.col("n_docs") > 1)
    )


def contaminated_doc_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Training documents sharing at least one token n-gram with an
    evaluation set — benchmark DECONTAMINATION (the GPT-3/Pile-style
    n-gram containment check; 8-13 grams are the published range).

    Geometry built for the real asymmetry: eval sets are megabytes,
    the corpus is the 100 TB side. The eval shingle set is distinct-ed
    and BROADCAST; the corpus streams through one shingle projection +
    explode with a broadcast-hash semi join — no corpus-side shuffle
    except the final distinct over the (small) contaminated-id set.
    ``portable=True`` switches to the md5-prefix mod-p shingle family
    so a DuckDB oracle replays the exact hash sets."""
    sh_fn = portable_shingled_hashes if portable else shingled_hashes
    doc_sh = sh_fn(docs, id_col, text_col, n=n).select(
        "did", F.explode("sh").alias("__h")
    )
    ev_sh = (
        sh_fn(eval_docs, id_col, text_col, n=n)
        .select(F.explode("sh").alias("__h"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(ev_sh), "__h", "left_semi")
        .select(F.col("did").alias(id_col))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
    mode: str = "drop",
) -> DataFrame:
    """Remove (``mode='drop'``) or mark (``mode='flag'`` — adds a
    ``contaminated`` boolean) training docs that leak evaluation
    n-grams. Drop is an anti-join on the contaminated-id set; flag is a
    left semi-derived boolean — either way the corpus is scanned
    once."""
    bad = contaminated_doc_ids(
        docs, eval_docs, n=n, id_col=id_col, text_col=text_col, portable=portable
    )
    if mode == "drop":
        return docs.join(bad, id_col, "left_anti")
    if mode == "flag":
        marked = bad.withColumn("contaminated", F.lit(True))
        return docs.join(marked, id_col, "left").fillna(False, ["contaminated"])
    raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")


def jaccard_prefix_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.8,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING — the lossless
    scale path for the exhaustive tier.

    ``ngram_jaccard_pairs`` is exact but must either index every shingle
    (the join fans out quadratically on common shingles) or cap document
    frequency (``max_doc_freq`` — bounded, but an explicit approximation
    that measurably loses tail recall on adversarial corpora). Prefix
    filtering (the AllPairs / PPJoin family, Bayardo et al. WWW'07 and
    Xiao et al. WWW'08 — both public) is exact AND bounded: order each
    document's shingles by one global total order (ascending document
    frequency, ties by hash — rarest first), and index only the first

        p = |x| - ceil(t * |x|) + 1

    shingles of each document. Two sets with Jaccard >= t must overlap by
    at least ceil(t * |x|) elements, which is impossible unless their
    p-prefixes under the shared order intersect — so joining on prefix
    shingles alone finds every qualifying pair, and because prefixes are
    dominated by RARE shingles the per-shingle fan-out collapses without
    any recall dial. A length filter (min size >= t * max size, another
    exact necessary condition) prunes candidates before verification;
    survivors are verified with exact intersection over the full arrays.

    One extra shuffle vs the capped tier (the doc-frequency join that
    establishes the global order) buys losslessness; at 100 TB the
    candidate set — the term that actually explodes — is strictly
    smaller than any df-cap variant that keeps full recall. Intermediate
    shingle projections are persisted (MEMORY_AND_DISK) because the plan
    reuses them on both join sides — same lifetime convention as
    ``ngram_jaccard_pairs``.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    eps = 1e-9  # guards float ceil: 0.1*30 -> 3.0000000000000004
    sh = _pin_reused(
        shingled_hashes(docs, id_col, text_col, n=n), cache_handles
    )
    inv = sh.select("did", F.explode("sh").alias("hs"))
    freq = inv.groupBy("hs").agg(F.count(F.lit(1)).alias("df"))
    # Per-doc shingles in global (df asc, hs asc) order; prefix slice.
    ordered = (
        inv.join(freq, "hs")
        .groupBy("did")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "hs"))).alias("osh"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "did",
            "sz",
            F.slice(
                F.transform("osh", lambda s: s["hs"]),
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - eps) + 1).cast("int"),
            ).alias("prefix"),
        )
    )
    ordered = _pin_reused(ordered, cache_handles)
    pf = ordered.select("did", "sz", F.explode("prefix").alias("hs"))
    a, b = pf.alias("a"), pf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.hs") == F.col("b.hs"))
            & (F.col("a.did") < F.col("b.did"))
            # length filter: J >= t forces min(|x|,|y|) >= t * max(|x|,|y|)
            & (
                F.least("a.sz", "b.sz").cast("double")
                >= F.lit(threshold) * F.greatest("a.sz", "b.sz") - eps
            ),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("did").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("did").alias("id_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    w: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Rolling-hash document fingerprints via WINNOWING (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash every
    positional n-gram, slide a window of ``w`` consecutive hashes, keep
    each window's minimum. The selection guarantee: any match of at
    least ``w + n - 1`` consecutive tokens between two documents shares
    at least one selected fingerprint, while only ~2/(w+1) of all
    n-gram hashes are kept — a density/recall dial the full shingle set
    does not have. This is the containment-robust fingerprint tier:
    MinHash estimates whole-document resemblance, winnowing detects
    shared PASSAGES (plagiarism / quote / boilerplate reuse)
    regardless of how much unrelated text surrounds them.

    Returns ``(did, fps)`` with ``fps`` the sorted distinct selected
    hashes. Documents with fewer than ``n`` tokens are excluded (no
    n-gram exists); documents with fewer than ``w`` n-grams yield one
    fingerprint (the global minimum) — winnowing's "always select at
    least one" convention. ``portable=True`` switches to the mod-p
    md5 family so a DuckDB oracle replays hashes, windows, and
    selections exactly.

    All JVM built-ins: the positional shingle array is materialized
    BEFORE the window transform (the lambda-CSE discipline), and each
    window is ``array_min(slice(...))`` — O(tokens * w) per document,
    no explode until a consumer asks for the inverted index."""
    if n < 1 or w < 1:
        raise ValueError(f"n and w must be >= 1, got n={n}, w={w}")
    if portable:
        th = _token_hashes(
            docs, id_col, text_col,
            lambda t: portable_token_hash(t) % F.lit(PORTABLE_P),
            min_tokens=n,
        )
        psh = th.select("did", portable_shingle_hashes(F.col("th"), n).alias("psh"))
    else:
        th = _token_hashes(docs, id_col, text_col, min_tokens=n)
        psh = th.select("did", _shingle_hashes(F.col("th"), n).alias("psh"))
    m = F.greatest(F.size("psh") - F.lit(w - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), m), lambda j: F.array_min(F.slice(F.col("psh"), j, w))
    )
    return psh.select("did", F.array_sort(F.array_distinct(wins)).alias("fps"))


def shared_passage_candidates(
    fps: DataFrame,
    *,
    min_shared: int = 1,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints:
    ``(id_a, id_b, n_shared)``. One explode + equi-join on the
    fingerprint hash — the same inverted-index shape as the shingle
    tiers but over the ~2/(w+1)-density selected set, so the join input
    is a fraction of the full shingle index for the same passage-level
    recall guarantee.

    The default is 1 because that is what the winnowing guarantee
    actually promises: a match of exactly w+n-1 consecutive tokens may
    share only ONE selected fingerprint, so a higher default silently
    forfeits the documented boundary case (r11 review). Raise
    ``min_shared`` to trade that guarantee for less candidate noise on
    longer passages.

    The fingerprint input is PINNED before the explode (r14, found by
    the exact-substring scale smoke): generating from the RAW winnow
    plan evaluates the fingerprint lambda tower inside the Generate at
    a measured ~90x penalty (93s vs 1.1s winnow + 0.4s explode on a
    1000-doc corpus — the materialize-before-explode face of the
    lambda-CSE trap), and the unpinned plan additionally re-executes on
    both self-join sides. ``cache_handles`` follows the module's
    pinning convention (persist + caller-managed unpersist for
    fault-tolerant long jobs; localCheckpoint default)."""
    fps = _pin_reused(fps, cache_handles)
    inv = fps.select("did", F.explode("fps").alias("fp"))
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def suppress_repeated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_doc_freq: int = 5,
) -> DataFrame:
    """Remove boilerplate LINES that repeat across the corpus — the
    line-level dedup step of the CCNet / RefinedWeb / MassiveText
    pipelines (all public): navigation bars, cookie banners and license
    footers repeat across thousands of pages while each page's content
    lines are near-unique, so a line whose document frequency reaches
    ``min_doc_freq`` is dropped from EVERY document.

    Semantics:

    * a line is one ``sep``-delimited segment; its dedup identity is
      ``lower(trim(line))`` but the KEPT text preserves the original
      bytes and line order;
    * document frequency counts DISTINCT documents (a line repeated
      inside one document counts once);
    * blank-normalized lines are structure, not boilerplate: never
      counted, never removed;
    * NULL ``text_col`` rows pass through untouched (``n_removed`` 0);
      a document whose every line is suppressed keeps an empty string.

    Precondition (r13 ADVICE): ``id_col`` values must be UNIQUE — one
    row per document, the same contract as every per-document operator
    in this module. The reassembly groups by ``id_col``, so a repeated
    id would merge two documents' lines into one rebuilt text (sorted
    by interleaved position) and the final join would fan the merged
    text back out to both rows, silently. Deduplicate ids first
    (``exact_dedup``) if the corpus may violate this.

    Returns the input row set with ``text_col`` rewritten plus
    ``n_removed`` (lines dropped from that document).

    Scale shape: one map-side-combinable distinct over (doc, line-hash)
    feeds the document-frequency aggregation; suppression is a single
    anti-join of the exploded lines against the (small, aggregated) hot
    set; reassembly is one groupBy(doc) whose state is bounded by the
    document's own line count. O(corpus lines), no per-line Python.
    ``sep`` is treated as a LITERAL (regex-quoted for Spark's split),
    matching the SQL ``string_split`` the oracle uses."""
    if min_doc_freq < 2:
        raise ValueError(
            f"min_doc_freq must be >= 2 (1 would suppress every "
            f"non-blank line), got {min_doc_freq}"
        )
    pat = "\\Q" + sep + "\\E"  # java-regex literal quoting, any sep
    text = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.posexplode(F.split(text, pat, -1)).alias("__idx", "__line"),
    )
    # identity key is the normalized STRING, not a 64-bit hash: at
    # 100 TB line cardinalities a hash collision with a hot line would
    # SILENTLY suppress innocent lines (the exact-contract lesson of
    # the r12 ngram-cap advice). The string key costs a wider df
    # shuffle; the suppression side stays cheap — the hot set is
    # aggregated and threshold-filtered before the anti-join.
    k = F.lower(F.trim(F.col("__line")))
    nonblank = F.trim(F.col("__line")) != ""
    lines = base.select(F.col(id_col), "__idx", "__line", k.alias("__k"), nonblank.alias("__nb"))
    hot = (
        lines.where("__nb")
        .select(id_col, "__k")
        .distinct()
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= min_doc_freq)
        .select("__k")
    )
    kept = lines.join(hot, ["__k"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("__clean"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_lines = F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.split(text, pat, -1))
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("__n_lines", n_lines)
        .join(rebuilt, [id_col], "left")
        .select(
            *out_cols,
            F.when(text.isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("__clean"), F.lit("")))
            .alias(text_col),
            (F.col("__n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def exact_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 12,
    k: int = 8,
    candidates: DataFrame | None = None,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Maximal cross-document EXACT token runs of >= ``min_len`` tokens
    — the exact-substring duplication tier of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better":
    their ExactSubstr pipeline computes these spans with a single-node
    suffix array; a suffix array does not distribute, but the same
    spans fall out of a two-stage bounded Spark plan).

    Stage 1 — candidates (sub-quadratic): winnowing fingerprints over
    ``k``-gram hashes with window ``w = min_len - k + 1``
    (:func:`winnow_fingerprints`). The winnowing guarantee (SIGMOD'03)
    promises any shared run of >= w + k - 1 = ``min_len`` tokens shares
    at least one SELECTED fingerprint, so the candidate pair set from
    :func:`shared_passage_candidates` is a superset of every pair with
    a qualifying span — recall 1.0 by theorem, not tuning (the same
    losslessness shape as the Jaccard prefix-filter tier, and the
    pinned equivalence test replays it against exhaustive all-pairs
    candidates).

    Stage 2 — exact verification (candidate-bounded): for candidate
    docs only, join k-gram STRINGS (collision-free — hashes appear only
    in stage 1, where a collision merely adds a candidate pair) between
    the two sides of each pair, group matches by diagonal ``pa - pb``,
    and merge consecutive anchor positions into maximal runs
    (gaps-and-islands: c consecutive matching k-grams on one diagonal
    form a shared span of c + k - 1 tokens). Runs under ``min_len``
    drop.

    Returns ``(id_a, id_b, start_a, start_b, span_len)`` with
    ``id_a < id_b`` and 0-based token start positions. Periodic text
    yields overlapping spans on different diagonals — faithful to the
    match structure (each is a genuine maximal alignment).

    Scale shape: stage 1 is the only corpus-scale pass — one winnowed
    inverted-index join at ~2/(w+1) of full k-gram density. Stage 2
    reads only candidate-pair documents: the gram join is driven
    through the candidate pair ids, and the islands window partitions
    by (pair, diagonal) — bounded by the shorter document's length,
    never corpus-sized. ``candidates`` overrides stage 1 (pass MinHash
    pairs to focus on near-dups, or an all-pairs frame for exhaustive
    oracle verification)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_len < k:
        raise ValueError(
            f"min_len ({min_len}) must be >= k ({k}) — a span cannot be "
            f"shorter than its anchor gram"
        )
    from pyspark.sql.window import Window

    if candidates is None:
        fps = winnow_fingerprints(
            docs, id_col, text_col, n=k, w=min_len - k + 1
        )
        candidates = shared_passage_candidates(
            fps, min_shared=1, cache_handles=cache_handles
        )
    # The candidate pair set is referenced THREE times below (both sides
    # of the ids union + the pair join) and the gram table TWICE (the
    # self-join's two aliases): unpinned, Spark would re-execute the
    # whole winnow-fingerprint + inverted-index-join pipeline once per
    # reference — measured 100s vs 2.4s on a 1000-doc corpus (the same
    # unpersisted-reuse class as incremental_minhash_pairs' delta
    # index). Both intermediates are bounded: pairs by the winnowed
    # collision structure, grams by candidate-doc token counts.
    cand = _pin_reused(candidates.select("id_a", "id_b"), cache_handles)

    ids = (
        cand.select(F.col("id_a").alias("did"))
        .unionByName(cand.select(F.col("id_b").alias("did")))
        .distinct()
    )
    toks = docs.select(
        F.col(id_col).alias("did"), F.split(F.col(text_col), " ").alias("ws")
    ).join(ids, "did", "left_semi")
    grams = _pin_reused(_grams_from_tokens(toks, k), cache_handles)
    return _diagonal_spans(cand, grams, grams, min_len=min_len, k=k)


def _grams_from_tokens(toks: DataFrame, k: int) -> DataFrame:
    """(did, pos, g): positional k-gram STRINGS from a (did, ws) token
    table — 0-based start positions, collision-free join keys for the
    exact verification stage. Docs shorter than ``k`` yield no rows."""
    m = F.size("ws") - F.lit(k - 1)
    return toks.select(
        "did",
        F.posexplode(
            F.when(
                m > 0,
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda i: F.array_join(F.slice(F.col("ws"), i, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "g"),
    )


def _diagonal_spans(
    cand: DataFrame,
    grams_a: DataFrame,
    grams_b: DataFrame,
    *,
    min_len: int,
    k: int,
) -> DataFrame:
    """Maximal shared runs per candidate pair from two positional gram
    tables: equi-join grams within each (id_a, id_b) pair, group by
    diagonal ``pa - pb``, merge consecutive positions (gaps-and-islands)
    into runs, keep runs of >= ``min_len`` tokens. Shared by the batch
    operator (both sides one corpus) and the stored-index probe (corpus
    side vs delta side). Callers pin reused gram inputs."""
    from pyspark.sql.window import Window

    ga, gb = grams_a.alias("ga"), grams_b.alias("gb")
    matches = (
        cand.alias("c")
        .join(ga, F.col("ga.did") == F.col("c.id_a"))
        .join(
            gb,
            (F.col("gb.did") == F.col("c.id_b"))
            & (F.col("gb.g") == F.col("ga.g")),
        )
        .select(
            "c.id_a",
            "c.id_b",
            F.col("ga.pos").alias("pa"),
            F.col("gb.pos").alias("pb"),
        )
        .withColumn("d", F.col("pa") - F.col("pb"))
    )
    win = Window.partitionBy("id_a", "id_b", "d").orderBy("pa")
    runs = matches.withColumn("isl", F.col("pa") - F.row_number().over(win))
    return (
        runs.groupBy("id_a", "id_b", "d", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("int").alias("span_len"),
        )
        .where(F.col("span_len") >= min_len)
        .select("id_a", "id_b", "start_a", "start_b", "span_len")
    )


def winnow_span_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 12,
    k: int = 8,
) -> DataFrame:
    """One durable index row per document for the exact-substring tier:
    ``(did, ws, fps)`` — the token array (stage-2 verification needs the
    exact grams) plus winnow fingerprints at the ``w = min_len - k + 1``
    guarantee window (stage-1 candidates). Persist with
    ``operators/index_store.py:save_winnow_index``; delta batches MUST
    be built with the same ``(min_len, k)`` the sidecar records —
    fingerprints from different parameters never collide correctly.
    Documents shorter than ``k`` tokens keep an EMPTY fingerprint array
    (present in the index, candidates with nothing — they cannot
    contain a k-gram, let alone a >= min_len run)."""
    fps = winnow_fingerprints(docs, id_col, text_col, n=k, w=min_len - k + 1)
    toks = docs.select(
        F.col(id_col).alias("did"), F.split(F.col(text_col), " ").alias("ws")
    )
    return toks.join(fps, "did", "left").select(
        "did",
        "ws",
        F.coalesce("fps", F.array().cast("array<bigint>")).alias("fps"),
    )


def remove_repeated_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 12,
    k: int = 8,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Apply :func:`exact_substring_spans` as a dedup: every duplicated
    run is removed from the HIGHER-id document of its span, so the
    smallest id keeps the canonical occurrence (this module's
    keep-min-id convention). Lee et al. 2021 likewise keep exactly one
    occurrence of each duplicated substring; anchoring the kept copy at
    the smallest id makes the choice deterministic. A single batch
    pass: spans are computed against the ORIGINAL texts and applied
    once (removal does not cascade into re-matching the rewritten
    texts — their semantics too).

    Returns the input row set with ``text_col`` rewritten from the
    surviving tokens plus ``n_removed`` (tokens dropped). NULL texts
    and span-free documents pass through verbatim with ``n_removed``
    0; a fully-covered document keeps an empty string. Overlapping
    spans remove their UNION of positions (no double counting).

    Precondition: ``id_col`` values are unique — one row per document
    (the :func:`suppress_repeated_lines` contract). Coverage filtering
    is in-row: O(tokens x spans-on-this-doc) with no Python."""
    if spans is None:
        spans = exact_substring_spans(
            docs, id_col, text_col, min_len=min_len, k=k
        )
    per_doc = (
        spans.select(
            F.col("id_b").alias("__did"),
            F.struct(
                F.col("start_b").alias("s"), F.col("span_len").alias("l")
            ).alias("sp"),
        )
        .groupBy("__did")
        .agg(F.collect_list("sp").alias("__sps"))
    )
    text = F.col(text_col)
    ws = F.split(text, " ")
    kept = F.filter(
        F.transform(ws, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("__sps"),
            lambda sp: (s["i"] >= sp["s"]) & (s["i"] < sp["s"] + sp["l"]),
        ),
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.join(per_doc, docs[id_col] == F.col("__did"), "left")
        .withColumn(
            "__kept",
            F.when(F.col("__sps").isNull() | text.isNull(), F.lit(None)).otherwise(
                kept
            ),
        )
        .select(
            *out_cols,
            F.when(F.col("__kept").isNull(), text)
            .otherwise(
                F.array_join(F.transform(F.col("__kept"), lambda s: s["t"]), " ")
            )
            .alias(text_col),
            F.when(F.col("__kept").isNull(), F.lit(0))
            .otherwise(F.size(ws) - F.size("__kept"))
            .cast("int")
            .alias("n_removed"),
        )
    )


def span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 12,
    k: int = 8,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-content accounting over
    :func:`exact_substring_spans`: for each document, the fraction of
    its tokens covered by exact runs shared with LOWER-id documents
    (the union of victim-side span positions — overlaps counted once).
    This is the document-level decision variable of the Lee et al. 2021
    pipeline's other face: instead of cutting the duplicated bytes out
    (:func:`remove_repeated_substrings`), DROP whole documents whose
    content is mostly owned by earlier ones (e.g. ``coverage >= 0.8``),
    which preserves document coherence at the cost of keeping some
    duplicated text — the trade the paper discusses.

    Returns one row per input document: ``(id, n_tokens, n_covered,
    coverage)`` with coverage in [0, 1] (0 for NULL/empty texts and
    span-free documents). Composition: ``span_coverage(...).where(
    F.col("coverage") < 0.8)`` joined back on the id is the keep set.

    Scale shape: the span tier's bounded plan plus one explode of
    victim spans into (doc, position) rows — bounded by total covered
    tokens, not corpus size — and a groupBy(doc) count."""
    if spans is None:
        spans = exact_substring_spans(
            docs, id_col, text_col, min_len=min_len, k=k
        )
    covered = (
        spans.select(
            F.col("id_b").alias("__did"),
            F.explode(
                F.sequence(
                    F.col("start_b"), F.col("start_b") + F.col("span_len") - 1
                )
            ).alias("__pos"),
        )
        .distinct()  # overlapping spans count each position once
        .groupBy("__did")
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    text = F.col(text_col)
    n_tokens = F.when(
        text.isNull() | (text == ""), F.lit(0)
    ).otherwise(F.size(F.split(text, " ")))
    return (
        docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
        .join(covered, F.col(id_col) == F.col("__did"), "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_covered", F.lit(0)).cast("int").alias("n_covered"),
            F.when(F.col("n_tokens") > 0,
                   F.round(F.coalesce("n_covered", F.lit(0)) / F.col("n_tokens"), 6))
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
    )
