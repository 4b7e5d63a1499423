"""Data-quality constraint checks and table profiling.

Warehouse pipelines gate loads on declarative constraints (the dbt-test
/ Great-Expectations tier): uniqueness of business keys, non-null
columns, referential integrity, accepted value domains. Each check is a
small declarative plan over the table being loaded:

* ``check_not_null`` / ``check_accepted_values`` — per-row predicates
  aggregated map-side; zero joins.
* ``check_unique`` — one groupBy on the key columns (the same shuffle
  the load's own dedup would pay).
* ``check_foreign_key`` — a LEFT ANTI join child→parent; the parent
  side is key-pruned (one column scanned) and broadcasts when it fits,
  exactly like the SCD merge's brand-new-key branch.

``run_checks`` evaluates a suite and returns one row per check —
(check, n_violations) — so a loader can fail/quarantine on any
non-zero row without collecting violation details unless asked.
``profile`` computes per-column null and exact distinct counts in ONE
pass over the table (a single aggregation producing a struct per
column, unpivoted in-row afterwards — not one job per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    # coalesce: an empty table must report 0 violations, not NULL
    aggs = [
        F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(c).alias("col"), F.col(c).alias("n")) for c in cols
            ]
        )
    )
    return row.select(stacked.alias("s")).select(
        F.concat(F.lit("not_null:"), F.col("s.col")).alias("check"),
        F.col("s.n").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n"))
    )
    return dups.select(
        F.lit("unique:" + ",".join(cols)).alias("check"),
        F.col("n").alias("n_violations"),
    )


def check_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return orphans.select(
        F.lit(f"fk:{child_key}->{parent_key}").alias("check"),
        F.col("n").alias("n_violations"),
    )


def check_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    bad = df.agg(
        F.sum(
            (~F.col(col).isin(*values) | F.col(col).isNull()).cast("long")
        ).alias("n")
    )
    return bad.select(
        F.lit(f"accepted_values:{col}").alias("check"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_violations"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column (col, n_rows, n_nulls, n_distinct) in ONE aggregation
    pass (exact distincts: Spark rewrites multi-distinct aggregates
    with a single expand — still one job, not |cols| jobs)."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0).cast("long")
            ).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(f"__rows_{c}").alias("n_rows"),
                    F.col(f"__nulls_{c}").alias("n_nulls"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                )
                for c in cols
            ]
        )
    )
    return row.select(stacked.alias("s")).select("s.*")


def mad_outlier_stats(
    df: DataFrame,
    val_col: str,
    *,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust per-group outlier bounds via the median absolute
    deviation: ``median ± k * 1.4826 * MAD`` (1.4826 scales MAD to a
    Gaussian sigma; k=3.5 is the conventional robust-z cutoff). The
    point of MAD over mean/stddev: a contaminated column cannot drag
    its own fence — up to 50% of the data can be corrupt before the
    bounds move, where one infinite value destroys a z-score.

    Returns ``(group..., n, median, mad, lo, hi, n_outliers)``.

    Two EXACT median aggregations (value, then absolute deviation) —
    per-group sort-based aggregates, so per-group cardinality must fit
    an executor; that is the exact tier's contract. At 100 TB use the
    binned-histogram percentiles (operators/sketches.py) for the
    medians and keep the same fence arithmetic — one bounded-state
    combinable pass per median at one-bin-width error."""
    g = list(group_cols or [])
    stats = _mad_fences(df, val_col, g, k, consistency)
    rejoined = _join_on_groups(df, stats, g)
    counts = rejoined.groupBy(*g).agg(
        F.sum(
            ((F.col(val_col) < F.col("lo")) | (F.col(val_col) > F.col("hi"))).cast("long")
        ).alias("n_outliers")
    )
    return _join_on_groups(stats, counts, g, broadcast=False)


def _join_on_groups(
    df: DataFrame, other: DataFrame, g: list[str], *, broadcast: bool = True
) -> DataFrame:
    """Inner join on the group columns that matches NULL keys — a USING
    join never matches NULLs, so NULL-key rows silently vanished from
    the flagged output and NULL groups from the stats (r11 review)."""
    from functools import reduce

    from pyspark.sql import Column

    o = F.broadcast(other) if broadcast else other
    if not g:
        return df.crossJoin(o)
    d, r = df.alias("__ql"), o.alias("__qr")
    cond = reduce(
        Column.__and__,
        [F.col(f"__ql.{c}").eqNullSafe(F.col(f"__qr.{c}")) for c in g],
    )
    keep = [F.col(f"__ql.{c}") for c in df.columns] + [
        F.col(f"__qr.{c}") for c in other.columns if c not in g
    ]
    return d.join(r, cond).select(*keep)


def _mad_fences(
    df: DataFrame, val_col: str, g: list[str], k: float, consistency: float
) -> DataFrame:
    """``(group..., n, median, mad, lo, hi)`` — the fence computation
    WITHOUT the n_outliers rejoin, so :func:`flag_mad_outliers` does
    not pay an extra full pass whose counts it immediately discards
    (r11 review; Catalyst cannot prune the inner counts join)."""
    med = df.groupBy(*g).agg(
        F.percentile(F.col(val_col), F.lit(0.5)).alias("median"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = _join_on_groups(df, med, g)
    mad = joined.groupBy(*g).agg(
        F.percentile(F.abs(F.col(val_col) - F.col("median")), F.lit(0.5)).alias("mad")
    )
    return _join_on_groups(med, mad, g, broadcast=False).select(
        *g,
        "n",
        "median",
        "mad",
        (F.col("median") - F.lit(k * consistency) * F.col("mad")).alias("lo"),
        (F.col("median") + F.lit(k * consistency) * F.col("mad")).alias("hi"),
    )


def flag_mad_outliers(
    df: DataFrame,
    val_col: str,
    *,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    consistency: float = 1.4826,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Row-level companion of :func:`mad_outlier_stats`: the input plus
    a boolean ``flag_col`` — every input row present in the output,
    including NULL-key groups. The fences broadcast (one row per
    group), so the data side never shuffles for the flagging join."""
    g = list(group_cols or [])
    fences = _mad_fences(df, val_col, g, k, consistency).select(*g, "lo", "hi")
    joined = _join_on_groups(df, fences, g)
    return joined.withColumn(
        flag_col, (F.col(val_col) < F.col("lo")) | (F.col(val_col) > F.col("hi"))
    ).drop("lo", "hi")
