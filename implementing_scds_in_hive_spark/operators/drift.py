"""Distribution-drift detection between two dataset snapshots.

A 100 TB training pipeline re-ingests continuously; the question "did
the data change under me?" needs cheap, mergeable statistics, not a
model. Three standard detectors, all pure JVM aggregations:

* ``psi_drift`` — Population Stability Index over a categorical column
  (the industry-standard snapshot-vs-snapshot score:
  ``sum((p_a - p_b) * ln(p_a / p_b))``; rule-of-thumb thresholds 0.1
  "watch" / 0.25 "act").
* ``chi_square_drift`` — two-sample chi-square homogeneity statistic
  over a categorical column (counts, not fractions, so sample size
  drives significance). Returns the statistic and degrees of freedom;
  thresholding against a chi-square quantile is the caller's policy
  decision (no CDF dependency).
* ``ks_statistic`` — two-sample Kolmogorov-Smirnov distance over a
  numeric column: ``max_x |F_a(x) - F_b(x)|``, the standard numeric
  drift test.

Scale shapes: PSI and chi-square reduce each side to one row PER
CATEGORY (map-side-combinable count aggregation — the only shuffle is
|categories| rows). KS needs a global CDF, i.e. a running sum in value
order; a naive ``Window.orderBy(value)`` with no partition key is the
Exchange-SinglePartition trap this repo bans, so the cumulative counts
use the same two-pass distributed prefix sum as sequence packing
(functions/chunking.py): range-partition by value, per-partition
window, O(#partitions) driver offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def category_fractions(
    df: DataFrame, cat_col: str, *, label: str
) -> DataFrame:
    """(category, n_<label>, frac_<label>) — one combinable pass."""
    counts = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias(f"n_{label}")
    )
    total = counts.agg(F.sum(f"n_{label}").alias("__t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "category",
        f"n_{label}",
        (F.col(f"n_{label}").cast("double") / F.col("__t")).alias(f"frac_{label}"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cat_col: str,
    *,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Per-category PSI contributions plus fractions:
    ``(category, frac_a, frac_b, psi_term)``; ``sum(psi_term)`` is the
    PSI. A category absent on one side contributes via the ``epsilon``
    floor (the standard smoothing — PSI is undefined at zero), so new
    and vanished categories register as strong drift instead of
    erroring. Cost: one count-aggregation per side + a |categories|-row
    outer join."""
    fa = category_fractions(df_a, cat_col, label="a")
    fb = category_fractions(df_b, cat_col, label="b")
    pa = F.greatest(F.coalesce(F.col("frac_a"), F.lit(0.0)), F.lit(epsilon))
    pb = F.greatest(F.coalesce(F.col("frac_b"), F.lit(0.0)), F.lit(epsilon))
    # NULL is a legitimate category and must match ITSELF across the
    # sides: a USING join never matches NULL keys, so identical NULL
    # fractions on both sides split into two unmatched rows and
    # register ~2.3 PSI of phantom drift (r11 review) — join null-safe
    fa, fb = fa.alias("fa"), fb.alias("fb")
    return (
        fa.join(
            fb,
            F.col("fa.category").eqNullSafe(F.col("fb.category")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("fa.category"), F.col("fb.category")).alias(
                "category"
            ),
            F.coalesce(F.col("frac_a"), F.lit(0.0)).alias("frac_a"),
            F.coalesce(F.col("frac_b"), F.lit(0.0)).alias("frac_b"),
            ((pa - pb) * (F.log(pa) - F.log(pb))).alias("psi_term"),
        )
    )


def chi_square_drift(
    df_a: DataFrame, df_b: DataFrame, cat_col: str
) -> DataFrame:
    """One-row result ``(chi2, dof, n_a, n_b)`` for the two-sample
    homogeneity test: expected counts come from the pooled category
    distribution; ``chi2 = sum over (side, category) of
    (observed - expected)^2 / expected``; ``dof = #categories - 1``.
    Categories with zero pooled count cannot occur by construction."""
    ca = category_fractions(df_a, cat_col, label="a").select("category", "n_a")
    cb = category_fractions(df_b, cat_col, label="b").select("category", "n_b")
    ca, cb = ca.alias("ca"), cb.alias("cb")
    joined = (  # null-safe: NULL is one category, not two (r11 review)
        ca.join(
            cb,
            F.col("ca.category").eqNullSafe(F.col("cb.category")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("ca.category"), F.col("cb.category")).alias(
                "category"
            ),
            F.coalesce(F.col("n_a"), F.lit(0)).cast("double").alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).cast("double").alias("n_b"),
        )
    )
    tot = joined.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    with_exp = joined.crossJoin(F.broadcast(tot)).select(
        "category",
        "n_a",
        "n_b",
        (F.col("ta") * (F.col("n_a") + F.col("n_b")) / (F.col("ta") + F.col("tb"))).alias("e_a"),
        (F.col("tb") * (F.col("n_a") + F.col("n_b")) / (F.col("ta") + F.col("tb"))).alias("e_b"),
        "ta",
        "tb",
    )
    return with_exp.agg(
        F.sum(
            (F.col("n_a") - F.col("e_a")) * (F.col("n_a") - F.col("e_a")) / F.col("e_a")
            + (F.col("n_b") - F.col("e_b")) * (F.col("n_b") - F.col("e_b")) / F.col("e_b")
        ).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    val_col: str,
    *,
    n_parts: int | None = None,
) -> DataFrame:
    """One-row ``(ks, n_a, n_b)``: the two-sample KS distance
    ``max_x |F_a(x) - F_b(x)|`` evaluated at every distinct observed
    value (where the max is attained; ties handled by aggregating per
    distinct value BEFORE the running sum, so F jumps once per value).
    Raises ``ValueError`` if either side is empty (the distance is
    undefined there — an upstream filter that matched nothing should
    fail loudly, not emit NaN). The result is materialized internally
    so the per-partition cache releases before return (ADVICE r5); the
    lazy two-pass plan itself is :func:`_ks_distances` (plan-shape
    guarded in tests/test_plan_shapes.py)."""
    handles: list[DataFrame] = []
    dist, n_a, n_b, spark = _ks_distances(
        df_a, df_b, val_col, n_parts=n_parts, cache_handles=handles
    )
    if n_a == 0 or n_b == 0:
        for h in handles:
            h.unpersist()
        raise ValueError(
            f"ks_statistic: empty side (n_a={n_a}, n_b={n_b}); "
            "the KS distance is undefined on an empty sample"
        )
    ks = dist.agg(F.max("__d").alias("ks")).collect()[0]["ks"]
    for h in handles:
        h.unpersist()
    return spark.createDataFrame(
        [(float(ks), int(n_a), int(n_b))], "ks double, n_a long, n_b long"
    )


def _ks_distances(
    df_a: DataFrame,
    df_b: DataFrame,
    val_col: str,
    *,
    n_parts: int | None = None,
    cache_handles: list[DataFrame] | None = None,
):
    """The lazy two-pass KS plan: per-distinct-value ``__d`` =
    ``|F_a - F_b|`` via range-partitioned per-partition running sums +
    broadcast partition offsets — no single-partition window anywhere.
    Returns ``(distances_df, n_a, n_b, spark)``; the persisted
    intermediate is appended to ``cache_handles`` for the caller to
    release."""
    from pyspark.storagelevel import StorageLevel

    # the KS distance is defined over VALUES — NULLs are not a point on
    # the real line. Unfiltered they grouped as a distinct "smallest"
    # value and inflated one CDF (50 NULLs on one side of otherwise
    # identical samples read as KS ~ 0.33 — r11 review); drop them and
    # exclude them from n_a/n_b like every standard implementation.
    per_val = (
        df_a.select(F.col(val_col).alias("v")).withColumn("__ca", F.lit(1)).withColumn("__cb", F.lit(0))
        .unionByName(
            df_b.select(F.col(val_col).alias("v")).withColumn("__ca", F.lit(0)).withColumn("__cb", F.lit(1))
        )
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.sum("__ca").alias("da"), F.sum("__cb").alias("db"))
    )
    spark = df_a.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # Pin the aggregated per-value counts BEFORE the range shuffle:
    # repartitionByRange's boundary-sampling job executes the upstream
    # plan once more, so the full union+groupBy over both samples ran
    # twice (the hazard operators/scd.py two_pass and chunking's prefix
    # sums document; measured 3x upstream cost on pack_sequences, r13).
    from implementing_scds_in_hive_spark.operators.dedup import _pin_reused

    per_val = _pin_reused(per_val, cache_handles)
    local = (
        per_val.repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__la",
            F.sum("da").over(
                Window.partitionBy("__pid").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "__lb",
            F.sum("db").over(
                Window.partitionBy("__pid").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = {
        r["__pid"]: (r["ta"], r["tb"])
        for r in local.groupBy("__pid")
        .agg(F.sum("da").alias("ta"), F.sum("db").alias("tb"))
        .collect()
    }
    offs, acc_a, acc_b = {}, 0, 0
    for pid in sorted(totals):
        offs[pid] = (acc_a, acc_b)
        acc_a += totals[pid][0]
        acc_b += totals[pid][1]
    off_df = spark.createDataFrame(
        [(p, a, b) for p, (a, b) in offs.items()] or [(0, 0, 0)],
        "__pid int, __oa long, __ob long",
    )
    if cache_handles is not None:
        cache_handles.append(local)
    n_a, n_b = float(max(acc_a, 1)), float(max(acc_b, 1))
    dist = local.join(F.broadcast(off_df), "__pid").select(
        (
            F.abs(
                (F.col("__la") + F.col("__oa")).cast("double") / F.lit(n_a)
                - (F.col("__lb") + F.col("__ob")).cast("double") / F.lit(n_b)
            )
        ).alias("__d")
    )
    return dist, int(acc_a), int(acc_b), spark


def psi_from_counts(
    counts: DataFrame,
    reference: DataFrame,
    *,
    epsilon: float = 1e-6,
) -> DataFrame:
    """PSI terms from a maintained count table (``category, n`` — e.g.
    the live table ``streaming/sketch_stream.py:category_count_stream``
    keeps) against a frozen reference snapshot of the same shape:
    ``(category, frac_live, frac_ref, psi_term)``. Same epsilon floor
    and full-outer semantics as :func:`psi_drift`, but consuming
    pre-aggregated counts so the monitor never rescans the raw stream
    history."""
    live = counts.groupBy("category").agg(F.sum("n").alias("__nl"))
    ref = reference.groupBy("category").agg(F.sum("n").alias("__nr"))
    tl = live.agg(F.sum("__nl").alias("__tl"))
    tr = ref.agg(F.sum("__nr").alias("__tr"))
    fl = live.crossJoin(F.broadcast(tl)).select(
        "category", (F.col("__nl").cast("double") / F.col("__tl")).alias("frac_live")
    )
    fr = ref.crossJoin(F.broadcast(tr)).select(
        "category", (F.col("__nr").cast("double") / F.col("__tr")).alias("frac_ref")
    )
    pl = F.greatest(F.coalesce(F.col("frac_live"), F.lit(0.0)), F.lit(epsilon))
    pr = F.greatest(F.coalesce(F.col("frac_ref"), F.lit(0.0)), F.lit(epsilon))
    fl, fr = fl.alias("fl"), fr.alias("fr")
    return (  # null-safe: NULL is one category, not two (r11 review)
        fl.join(
            fr,
            F.col("fl.category").eqNullSafe(F.col("fr.category")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("fl.category"), F.col("fr.category")).alias(
                "category"
            ),
            F.coalesce(F.col("frac_live"), F.lit(0.0)).alias("frac_live"),
            F.coalesce(F.col("frac_ref"), F.lit(0.0)).alias("frac_ref"),
            ((pl - pr) * (F.log(pl) - F.log(pr))).alias("psi_term"),
        )
    )
