"""Mergeable sketch aggregates — approximate statistics that survive 100 TB.

Exact ``COUNT(DISTINCT)`` and exact percentiles both force every value
for a group onto one reducer (distinct shuffle / global sort). At
cluster scale the right primitive is a *mergeable sketch*: a bounded
per-group summary that (a) is built in one map-side-combinable pass,
(b) merges associatively across partitions, days, or tables, and
(c) answers the query with a bounded error. Everything here is
deterministic and DuckDB-replayable (no RNG, no engine-specific sketch
formats — the oracle recomputes the identical bottom-k / bucket
arithmetic):

* ``kmv_sketch`` / ``kmv_merge`` / ``kmv_estimate`` — K-Minimum-Values
  distinct-count sketch (Bar-Yossef et al. 2002; the theta-sketch
  family's simplest member). The sketch IS the k smallest distinct
  values of a uniform hash of the key; the estimator is
  ``(k-1) * H / h_(k)`` with ``H`` the hash-space size. Merging two
  sketches is bottom-k of their union — identical to sketching the
  union of the inputs, which makes per-partition / per-day sketches
  exactly composable (the incremental-rollup story for distinct
  counts, which plain COUNT(DISTINCT) can never give: distincts don't
  add).
* ``kmv_jaccard`` — set-overlap estimation (Jaccard / intersection /
  union cardinality) from two sketches alone (Beyer et al. 2007's
  union-slice construction): join-size and overlap planning over
  100 TB key sets as in-row array arithmetic, no data read.
* ``binned_percentiles`` — single-pass fixed-bin histogram percentiles.
  One map-side-combinable ``(group, bucket) -> count`` aggregation
  (at most ``num_bins`` rows per group regardless of input size),
  then a tiny per-group cumulative scan. Error is bounded by the bin
  width; bucket counts add, so histograms from different partitions
  or days merge by summing — unlike exact percentiles, which need the
  raw data again.

Reference parity note: the reference (a HiveQL SCD tutorial,
/root/reference/SCD_script.txt) has no approximate aggregates; these
belong to the engine-extension surface SURVEY.md §2.5/§2.9 requires
for pipeline analytics at scale.

Hash portability: the scale default is ``xxhash64`` (JVM codegen, no
string materialization). ``portable=True`` switches to the md5-prefix
60-bit hash (``operators/dedup.py:portable_token_hash`` convention) so
the DuckDB oracle can replay the sketch bit-for-bit; same trade
documented for MinHash/SimHash.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash space of the portable md5-prefix hash (15 hex chars).
PORTABLE_HASH_SPACE = float(1 << 60)
# Full signed-64 space of xxhash64, shifted to non-negative by masking
# the sign bit (keeps ORDER BY semantics identical across engines).
XX_HASH_SPACE = float(1 << 63)

DEFAULT_K = 64


def _portable_value_hash(v: Column) -> Column:
    """60-bit non-negative hash replayable in ANSI SQL:
    ``CAST('0x' || substring(md5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT)``.
    Delegates to the ONE portable-hash construction (dedup's) so a
    convention change cannot silently diverge per module (r11 review);
    value-identical: this is exactly that hash over ``CAST(v AS
    STRING)``."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        portable_token_hash,
    )

    return portable_token_hash(v.cast("string"))


def _value_hash(v: Column, portable: bool) -> Column:
    if portable:
        return _portable_value_hash(v)
    # sign-bit masked xxhash64: non-negative, uniform on [0, 2^63)
    return F.xxhash64(v).bitwiseAND(F.lit((1 << 63) - 1))


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = DEFAULT_K,
    portable: bool = False,
    fanout: int = 64,
) -> DataFrame:
    """Build a per-group KMV sketch: ``group_cols... , kmv array<bigint>``
    (the k smallest DISTINCT hashes, ascending, size <= k).

    Plan shape (all stages bounded — no per-group state proportional to
    cardinality):
      1. hash + distinct-by-(group, hash): one shuffle, map-side
         combinable (partial aggregation dedupes before the exchange).
      2. pre-rank inside (group, hash % fanout): every window partition
         holds ~distinct/fanout rows; survivors <= fanout * k per group.
      3. final rank inside group over <= fanout*k candidates.
    Step 2 exists because a single window over ALL distinct hashes of a
    hot group would sort that group's full cardinality on one task —
    the same skew trap as sessionize (PLANS.md); the two-level split
    bounds it, and bottom-k(bottom-k per slice) == global bottom-k
    exactly.
    """
    g = list(group_cols)
    # COUNT(DISTINCT x) ignores NULLs — so must the sketch. Worse than
    # a semantic quibble: the portable hash of NULL is NULL, which
    # sorts FIRST in the rank windows and then silently drops out of
    # collect_list, capping the sketch at k-1 elements — kmv_estimate's
    # "n < k is exact" branch then reports ~k-1 distinct for ANY true
    # cardinality (r11 review, confirmed live).
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*g, _value_hash(F.col(value_col), portable).alias("__h"))
        .groupBy(*g, "__h")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    w_pre = Window.partitionBy(*g, F.pmod(F.col("__h"), F.lit(fanout))).orderBy("__h")
    pre = hashed.withColumn("__r", F.row_number().over(w_pre)).where(F.col("__r") <= k)
    w_fin = Window.partitionBy(*g).orderBy("__h")
    fin = pre.withColumn("__r2", F.row_number().over(w_fin)).where(F.col("__r2") <= k)
    return fin.groupBy(*g).agg(F.sort_array(F.collect_list("__h")).alias("kmv"))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str], *, k: int = DEFAULT_K) -> DataFrame:
    """Merge two sketch tables (full outer on the group key): bottom-k of
    the union of the two hash sets. ``merge(sketch(A), sketch(B)) ==
    sketch(A UNION B)`` exactly — property-tested. In-row array math
    (union/dedupe/sort/slice), zero extra shuffles beyond the join."""
    g = list(group_cols)
    joined = (
        a.select(*g, F.col("kmv").alias("__ka"))
        .join(b.select(*g, F.col("kmv").alias("__kb")), on=g, how="full_outer")
    )
    empty = F.array().cast("array<bigint>")
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(F.coalesce(F.col("__ka"), empty), F.coalesce(F.col("__kb"), empty))
            )
        ),
        1,
        k,
    )
    return joined.select(*g, merged.alias("kmv"))


def kmv_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str],
    *,
    k: int = DEFAULT_K,
    portable: bool = False,
) -> DataFrame:
    """Distinct-count estimate per group from a sketch table.

    If the sketch holds fewer than k hashes the count is exact (every
    distinct hash is present); otherwise ``(k-1) * H / h_(k)`` — the
    classic unbiased KMV estimator on the k-th order statistic of a
    uniform [0, H) hash. Plain double arithmetic in one documented
    order so the oracle reproduces it bit-for-bit."""
    g = list(group_cols)
    space = PORTABLE_HASH_SPACE if portable else XX_HASH_SPACE
    n = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(space) / kth, 3)
    )
    return sketch.select(*g, n.alias("kmv_size"), est.alias("est_distinct"))


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = DEFAULT_K,
    portable: bool = False,
) -> DataFrame:
    """One-call build + estimate: per-group approximate COUNT(DISTINCT
    value_col) with bounded state. Expected relative error ~ 1/sqrt(k-2)
    (~13% at k=64, ~4% at k=512)."""
    return kmv_estimate(
        kmv_sketch(df, group_cols, value_col, k=k, portable=portable),
        group_cols,
        k=k,
        portable=portable,
    )


def binned_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    num_bins: int = 1000,
) -> DataFrame:
    """Fixed-width histogram: ``group_cols..., bucket int, cnt bigint``.
    Values below ``lo`` clamp to bucket 0, at/above ``hi`` to the last
    bucket (so the estimate degrades to the range edge rather than
    dropping rows). One map-side-combinable aggregation; output is at
    most ``num_bins`` rows per group whatever the input size, and two
    histograms merge by summing ``cnt`` — the mergeable-percentile
    primitive."""
    if not (lo < hi) or num_bins < 1:
        # a zero/negative width silently clamps EVERY value into bucket
        # 0 (and downstream percentiles read below lo) rather than
        # erroring — the silent-parameter-degeneracy class (r12 review)
        raise ValueError(
            f"binned histogram needs lo < hi and num_bins >= 1, got "
            f"lo={lo}, hi={hi}, num_bins={num_bins}"
        )
    g = list(group_cols)
    width = (hi - lo) / num_bins
    bucket = F.least(
        F.lit(num_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    # NULL values must not count at all (exact percentile/aggregate
    # semantics ignore them): greatest(0, NULL) is 0 in Spark, so
    # unfiltered NULLs all landed in bucket 0 and dragged every
    # quantile toward lo (r11 review, confirmed live)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*g, bucket.alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def binned_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    num_bins: int = 1000,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate percentiles from a single histogram pass: one row per
    group with a ``p<q>`` column per requested quantile (upper edge of
    the first bucket whose cumulative count reaches ``q * total`` —
    error bounded by one bin width).

    Scale shape: the raw-data stage is the histogram's single combinable
    aggregation; the cumulative window runs over <= num_bins rows per
    group — constant-bounded, never the input. Contrast exact
    ``percentile`` (per-group sort of all values) and
    ``approx_percentile`` (engine-specific digest the oracle cannot
    replay): this construction is both scale-safe AND verifiable."""
    g = list(group_cols)
    hist = binned_histogram(df, g, value_col, lo=lo, hi=hi, num_bins=num_bins)
    return percentiles_from_histogram(
        hist, g, lo=lo, hi=hi, num_bins=num_bins, qs=qs
    )


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    group_cols: Sequence[str],
    *,
    k: int = DEFAULT_K,
    portable: bool = False,
) -> DataFrame:
    """Per-group set-overlap estimates from two KMV sketch tables:
    ``jaccard_est``, ``intersection_est``, ``union_est`` — the
    join-size / overlap planning primitive.

    The standard KMV set construction (Beyer et al. 2007): take the k
    smallest hashes of the UNION of the two sketches; the fraction of
    those that appear in BOTH input sketches estimates Jaccard;
    |A ∩ B| ≈ J · |A ∪ B| with the union size from the union sketch's
    k-th order statistic. Everything is in-row array arithmetic on two
    already-built sketches — estimating the overlap of two 100 TB key
    sets costs two array intersections, no data read. Inner join on the
    group key: a group absent from either side has no overlap estimate
    to give."""
    g = list(group_cols)
    space = PORTABLE_HASH_SPACE if portable else XX_HASH_SPACE
    joined = a.select(*g, F.col("kmv").alias("__ka")).join(
        b.select(*g, F.col("kmv").alias("__kb")), on=g, how="inner"
    )
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__ka"), F.col("__kb")))), 1, k
    )
    both = F.size(
        F.array_intersect(
            F.array_intersect(F.col("__u"), F.col("__ka")), F.col("__kb")
        )
    )
    n_u = F.size("__u")
    kth = F.element_at("__u", k).cast("double")
    union_est = F.when(n_u < k, n_u.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(space) / kth, 3)
    )
    jac = F.round(both.cast("double") / n_u.cast("double"), 6)
    return (
        joined.withColumn("__u", union_k)
        .select(
            *g,
            jac.alias("jaccard_est"),
            F.round(jac * union_est, 3).alias("intersection_est"),
            union_est.alias("union_est"),
        )
    )


def merge_histograms(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge two ``binned_histogram`` outputs built with the SAME
    (lo, hi, num_bins): counts add per (group, bucket) — one combinable
    aggregation. With per-day histograms stored, any rolling-window
    percentile is merge + the tiny per-group cumulative scan, never a
    re-read of raw data."""
    g = list(group_cols)
    return (
        a.unionByName(b)
        .groupBy(*g, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def percentiles_from_histogram(
    hist: DataFrame,
    group_cols: Sequence[str],
    *,
    lo: float,
    hi: float,
    num_bins: int = 1000,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """The estimation tail of :func:`binned_percentiles`, factored out
    so it can run over stored / merged histograms. Same estimator, same
    column naming (``p50``/``p90``/...)."""
    g = list(group_cols)
    width = (hi - lo) / num_bins
    w = Window.partitionBy(*g).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__total", F.sum("cnt").over(Window.partitionBy(*g))
    )
    aggs = []
    for q in qs:
        name = f"p{str(q).replace('0.', '').ljust(2, '0')}"
        hit = F.when(
            F.col("__cum").cast("double") >= F.lit(q) * F.col("__total").cast("double"),
            F.col("bucket"),
        )
        est = F.lit(lo) + (F.min(hit) + F.lit(1)).cast("double") * F.lit(width)
        aggs.append(F.round(est, 4).alias(name))
    return cum.groupBy(*g).agg(*aggs)


# --- count-min sketch: mergeable point-frequency estimation -------------

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_cell(v: Column, row: int, width: int, portable: bool) -> Column:
    """Counter column for hash row ``row``: ``h_row(v) % width``. Each
    row keys an independent hash by suffixing the row index into the
    hashed payload (portable: md5-prefix of ``v || '#' || row``,
    replayable in ANSI SQL; scale default: seeded ``xxhash64(v, row)``)."""
    if portable:
        from implementing_scds_in_hive_spark.operators.dedup import (
            portable_token_hash,
        )

        # the one portable-hash construction, over the row-suffixed
        # payload — value-identical to the previous inline md5 form
        h = portable_token_hash(
            F.concat_ws("#", v.cast("string"), F.lit(str(row)))
        )
    else:
        h = F.xxhash64(v, F.lit(row)).bitwiseAND(F.lit((1 << 63) - 1))
    return F.pmod(h, F.lit(width)).cast("int")


def cms_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Per-group count-min sketch (Cormode & Muthukrishnan 2005):
    ``group_cols..., row int, col int, cnt bigint`` — only touched
    counters materialize, at most ``depth * width`` rows per group
    whatever the input size.

    One map-side-combinable aggregation: each input row contributes
    ``depth`` (row, col) increments via an in-row posexplode (no join,
    no per-value state). Counters ADD, so per-partition / per-day
    sketches merge by summing (:func:`cms_merge`) — the frequency
    analog of the KMV story: answering "how often did key X occur last
    quarter" from stored daily sketches without re-reading 100 TB.
    Point estimates never underestimate (min over ``depth`` counters;
    overestimate bounded by ~e/width of the group's total count)."""
    g = list(group_cols)
    v = F.col(value_col)
    cells = F.array(*[_cms_cell(v, i, width, portable) for i in range(depth)])
    return (
        df.select(*g, F.posexplode(cells).alias("row", "col"))
        .groupBy(*g, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width, hash mode):
    counts add per (group, row, col) — one combinable aggregation.
    ``merge(cms(A), cms(B)) == cms(A UNION ALL B)`` exactly
    (property-tested), because each counter is a plain sum."""
    g = list(group_cols)
    return a.unionByName(b).groupBy(*g, "row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Estimated frequency for each (group, value) probe row:
    ``probes... , est_count bigint`` = min over the ``depth`` counters
    the value hashes to (an untouched counter is 0 — a value the
    sketch never saw estimates 0, never negative, never a miss).

    Scale shape: probes explode to ``depth`` cells and equi-join the
    sketch on (group, row, col) — a hash join against a bounded-size
    table (<= depth*width rows/group), broadcastable whenever the probe
    or sketch side is small. The probed data itself is never read."""
    g = list(group_cols)
    v = F.col(value_col)
    cells = F.array(*[_cms_cell(v, i, width, portable) for i in range(depth)])
    exploded = probes.select(
        *g, v.alias(value_col), F.posexplode(cells).alias("row", "col")
    )
    joined = exploded.join(sketch, on=[*g, "row", "col"], how="left")
    return (
        joined.groupBy(*g, value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    min_count: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Values whose estimated per-group frequency is >= ``min_count``:
    build the sketch, probe it with the distinct (group, value) pairs,
    keep the survivors. CMS never underestimates, so there are NO
    false negatives — every true heavy hitter survives; collisions can
    only add spurious rows (bounded by the e/width overestimate), and
    at default sizing only when a group's cardinality presses against
    depth*width.

    Honest single-batch note (same as KMV's): with the candidates drawn
    from ``df`` itself this costs the same one combinable shuffle as the
    exact count — the sketch earns its keep when it is STORED: daily
    sketches merge into any window, and :func:`cms_lookup` then answers
    frequency/heavy-hitter queries over that window without re-reading
    the raw data, which exact counts cannot (counts of *distinct keys*
    don't compose without the full key lists)."""
    g = list(group_cols)
    sketch = cms_sketch(df, g, value_col, depth=depth, width=width, portable=portable)
    probes = df.select(*g, value_col).distinct()
    est = cms_lookup(
        sketch, probes, g, value_col, depth=depth, width=width, portable=portable
    )
    return est.where(F.col("est_count") >= F.lit(min_count))
