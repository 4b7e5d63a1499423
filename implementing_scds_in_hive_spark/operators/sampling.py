"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-dependent *per partition*: the same seed over a
repartitioned/recompacted table selects a different subset, so a
training mixture can silently change between runs. These samplers are
*content-addressed* instead — membership is a pure function of the
row's id and a salt, so the sample is stable across partitioning,
engines, and re-runs, and composable (a 10% sample of a 50% sample with
different salts behaves like independent draws).

Scale shapes:

* ``hash_sample`` / ``stratified_hash_sample`` are per-row filters —
  NO shuffle at all; the predicate sits directly above the scan and the
  sampled columns prune into the parquet reader. The right default at
  100 TB.
* ``topk_per_stratum`` (exact count per stratum, smallest-hash-first —
  deterministic reservoir sampling) is one hash exchange on the strata
  columns + per-stratum sort; Spark's ``WindowGroupLimit`` pushes the
  rank limit into the sort, so each partition keeps only k rows.
  Use for "exactly N docs per language" manifests.

Cross-engine verification: membership uses the portable md5-prefix hash
(``operators/dedup.py:portable_token_hash``) over ``salt || id``, so a
DuckDB oracle replays the exact subset. ``xxhash64`` would be ~cheaper
but the hash runs once per row (not per token) — the md5 cost is noise
next to the scan, and reproducibility across engines is the point of a
sampling manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import portable_token_hash

# Denominator for fraction thresholds: fraction 0.2 keeps rows whose
# hash bucket (uniform over [0, SCALE)) is < 200_000.
SCALE = 1_000_000


def sample_bucket(id_col: Column, salt: str) -> Column:
    """Uniform deterministic bucket in [0, SCALE) from (salt, id)."""
    return portable_token_hash(F.concat(F.lit(salt), id_col.cast("string"))) % SCALE


def hash_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by id content."""
    return df.where(sample_bucket(F.col(id_col), salt) < int(fraction * SCALE))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    stratum_col: str,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. up-sample low-resource
    languages): still a pure per-row filter — the stratum→threshold map
    folds into a literal CASE expression, so there is no join and no
    shuffle regardless of how many strata exist."""
    thr: Column = F.lit(int(default_fraction * SCALE))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(int(frac * SCALE))).otherwise(thr)
    return df.where(sample_bucket(F.col(id_col), salt) < thr)


def assign_split(
    df: DataFrame,
    splits: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "split0",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the sample bucket is
    cut into contiguous ranges proportional to the requested fractions
    (must sum to ~1). Content-addressed, so a document keeps its split
    across re-runs, repartitions, and engines — no leakage of val/test
    rows into train when the corpus is rebuilt. Per-row expression,
    no shuffle."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    # NULL-id rows previously fell through every WHEN to the LAST
    # split (NULL bucket fails all comparisons) — a corpus with NULL
    # ids silently concentrated them all in test/val, while
    # hash_sample excludes the same rows entirely (r11 review,
    # confirmed live). Exclude them here too: content-addressed
    # assignment needs a content identity; callers must key or drop
    # NULL ids explicitly.
    df = df.where(F.col(id_col).isNotNull())
    b = sample_bucket(F.col(id_col), salt)
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = b < int(upper * SCALE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def topk_per_stratum(
    df: DataFrame,
    k: int,
    *,
    strata_cols: list[str],
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest
    sample buckets (ties broken by id — fully deterministic). Equivalent
    to per-stratum reservoir sampling, but reproducible and restartable
    because membership depends only on content, not arrival order."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def mixture_sample(
    sources: list[tuple[str, DataFrame, float]],
    *,
    id_col: str = "doc_id",
    salt: str = "mix0",
    source_col: str = "source",
    columns: list[str] | None = None,
) -> DataFrame:
    """Compose a training mixture: for each ``(name, df, fraction)``
    source, keep a content-addressed Bernoulli sample at that source's
    rate and tag rows with the source name — the standard way a
    pretraining mix ("books at 2x, web at 0.3x ...") is materialized.

    Per-source membership uses an independent salt (``salt:name``), so
    a document appearing in two sources is sampled independently in
    each, and re-weighting one source never changes another's subset —
    the mix is reproducible AND independently tunable per source.

    Scale shape: each source is a zero-shuffle per-row filter above its
    own scan; the union is plan-level only (no exchange). ``columns``
    projects each source to a common schema (default: the first
    source's columns).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    cols = columns or list(sources[0][1].columns)
    parts = []
    for name, df, frac in sources:
        parts.append(
            hash_sample(df, frac, id_col=id_col, salt=f"{salt}:{name}")
            .select(*cols)
            .withColumn(source_col, F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_priority(id_col: Column, weight: Column, *, salt: str = "w") -> Column:
    """Exponential-race priority for weighted sampling: the MINIMUM of
    ``weight`` independent per-row hashes (uniform on the 60-bit
    portable space). Ranking ascending by this priority draws items
    with probability proportional to their integer weight — the
    min-of-w-uniforms race: P(item wins the global minimum) is exactly
    w_i/Σw in the exponential limit, and uniform hashes are
    tail-equivalent to exponentials where minima live (u ≪ 1; relative
    bias O(u_min), i.e. ~1/(n·w̄) — negligible at any corpus size).

    In-row construction: ``array_min(transform(sequence(1, w), c ->
    hash(salt:id:c)))`` — NO explode, NO extra shuffle, no join-back;
    cost O(w) per row, which is why weights are integer and capped by
    the caller. Content-addressed like every sampler here: stable under
    repartitioning, replayable by the DuckDB oracle."""
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), weight),
            lambda c: portable_token_hash(
                F.concat(F.lit(salt + ":"), id_col.cast("string"), F.lit(":"), c.cast("string"))
            ),
        )
    )


def sample_weighted_topk(
    df: DataFrame,
    k: int,
    *,
    id_col: str,
    weight_col: str,
    by: list[str] | None = None,
    max_weight: int = 1000,
    salt: str = "w",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the ``k``
    rows with the smallest weighted priorities, globally or per
    ``by``-stratum — e.g. "sample 10k documents proportional to token
    count", the standard corpus-mixture draw, reproducible across
    engines and partitionings.

    Rows with weight < 1 are excluded (zero weight = never sampled);
    weights clamp to ``max_weight`` (the O(w) in-row cost bound — at
    the cap, relative inclusion odds between two capped rows flatten,
    the usual practical truncation). Global mode is a
    TakeOrderedAndProject (k rows per partition, merged on the driver
    — never a global sort); stratified mode is one hash exchange +
    WindowGroupLimit-pruned per-stratum rank."""
    w = F.least(F.col(weight_col).cast("int"), F.lit(max_weight))
    pri = weighted_priority(F.col(id_col), w, salt=salt).alias("__pri")
    base = df.where(F.col(weight_col) >= 1).select("*", pri)
    if by:
        win = Window.partitionBy(*by).orderBy(F.col("__pri"), F.col(id_col))
        return (
            base.withColumn("__rk", F.row_number().over(win))
            .where(F.col("__rk") <= k)
            .drop("__pri", "__rk")
        )
    return (
        base.orderBy(F.col("__pri"), F.col(id_col)).limit(k).drop("__pri")
    )


def temperature_rates(
    counts: dict[str, int],
    *,
    alpha: float = 0.5,
    epochs_cap: float = 1.0,
) -> dict[str, float]:
    """Per-source sampling fractions implementing temperature-based
    mixture balancing (the multilingual-pretraining standard: sample
    source i with probability proportional to ``n_i ** alpha``, so
    alpha=1 keeps natural proportions and alpha->0 approaches uniform,
    up-weighting small sources).

    Given raw per-source document counts, returns the fraction of EACH
    source to keep so that the composed mix has the alpha-tempered
    shares while never requesting more than ``epochs_cap`` passes over
    any source (fraction <= epochs_cap; with the default 1.0, no
    source is oversampled — the whole mix scales down instead, the
    conservative choice when duplication hurts). Plug the result
    straight into :func:`mixture_sample`:

        rates = temperature_rates({"web": 9e9, "books": 1e8}, alpha=0.3)
        mix = mixture_sample([(k, dfs[k], r) for k, r in rates.items()])

    Driver-side arithmetic on the per-source count summary (a handful
    of numbers, not data); the heavy lifting stays in
    ``mixture_sample``'s zero-shuffle per-row filters."""
    if not counts:
        raise ValueError("counts must be non-empty")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("all source counts must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if epochs_cap > 1.0:
        # a fraction above 1 needs a DUPLICATING sampler; hash_sample's
        # bucket predicate silently clamps it to keep-everything, so
        # the realized mix would deviate from the tempered target with
        # no warning (r11 review). Refuse until such a sampler exists.
        raise ValueError(
            f"epochs_cap={epochs_cap} > 1 would request fractions above "
            f"1.0, which the hash samplers cannot honor (they keep at "
            f"most one copy per document) — the realized mix would "
            f"silently miss the tempered shares. Cap at 1.0, or "
            f"duplicate small sources upstream."
        )
    total = float(sum(counts.values()))
    powered = {k: float(n) ** alpha for k, n in counts.items()}
    z = sum(powered.values())
    # target share of the mix for source i: n_i^alpha / Z. With mix
    # size M, source i contributes share_i * M rows = frac_i * n_i, so
    # frac_i = share_i * M / n_i. Choose the largest M that keeps every
    # frac_i <= epochs_cap: M = epochs_cap / max_i(share_i / n_i).
    share = {k: powered[k] / z for k in counts}
    m = epochs_cap / max(share[k] / counts[k] for k in counts)
    # the binding source's fraction is epochs_cap by construction, but
    # the division round-trip can land an ulp above it — clamp so
    # callers can rely on fraction <= epochs_cap exactly
    return {k: min(epochs_cap, share[k] * m / counts[k]) for k in counts}


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    *,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    salt: str = "split0",
    split_col: str = "split",
) -> DataFrame:
    """Group-aware train/val/test assignment: near-duplicate documents
    must land in the SAME split, or eval rows leak into train as
    near-copies and benchmark numbers inflate (the published dedup
    papers' motivating failure). Plain ``assign_split`` hashes each doc
    id independently — two 0.95-Jaccard docs get independent splits.

    Composition: resolve the near-dup ``pairs`` into connected
    components (operators/graph.py — A~B, B~C links {A,B,C} even when
    A~C was never emitted), key every doc by its component
    representative (min reachable id; docs in no pair represent
    themselves), then content-address the SPLIT BY GROUP KEY with the
    same portable hash ``assign_split`` uses. Deterministic across
    re-runs/engines like every sampler here; the only shuffles are the
    component propagation (pairs-sized) and one membership join —
    the corpus itself is never re-keyed.

    Returns ``docs`` plus ``split_col`` and ``split_group`` (the group
    key, exposed because auditing leakage requires it)."""
    from implementing_scds_in_hive_spark.operators.graph import connected_components

    comp = connected_components(pairs, pair_cols[0], pair_cols[1]).select(
        F.col("node").alias(id_col), F.col("component")
    )
    keyed = docs.join(comp, id_col, "left").withColumn(
        "split_group", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    return assign_split(
        keyed, splits, id_col="split_group", salt=salt, split_col=split_col
    )
