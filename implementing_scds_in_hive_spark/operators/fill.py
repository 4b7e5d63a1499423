"""Forward fill (last observation carried forward), with a skew-bounded
two-level plan.

``forward_fill`` is the plain per-key running ``last(..., ignorenulls)``
window — the primitive under gap repair (driver query ``forward_fill``)
and the as-of join (``operators/asof.py``: union both streams, forward
fill the fact struct). Like the sessionizer, its window partitions by
the key, so a power-law key concentrates one task and AQE's
skew-splitting cannot help (windows are exempt).

``forward_fill_bucketed`` bounds the partitions the same way
``sessionize_bucketed`` does (see that module's docstring):

* Level 1 — fill within ``(key, time_bucket)``: a task sees at most one
  bucket of one key. Per bucket, also aggregate the bucket's LAST
  non-null value (``max_by`` over the order tuple — map-side partial,
  no window).
* Level 2 — carry across buckets at BUCKET granularity: per key, a
  running last-non-null over the bucket summaries (rows per key =
  active buckets, independent of event rate), taking each bucket's
  carry-in from strictly-earlier buckets.
* Stitch: ``coalesce(level-1 fill, carry-in)`` — positions after a
  bucket-local observation use it; a bucket's leading-null prefix takes
  the carry-in.

Exact agreement with the plain fill for any input is asserted in
``tests/test_skew_sessionize.py`` (driver corpus, planted bot,
hypothesis boundary cases). Works for any fillable column type
including structs, so the as-of join's carried fact struct composes
with it unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET_US_DEFAULT = 86_400_000_000  # 1 day


def _order_list(order_col: str | list[str]) -> list[str]:
    return [order_col] if isinstance(order_col, str) else list(order_col)


def forward_fill(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | list[str] = "event_id",
    out_col: str | None = None,
) -> DataFrame:
    """Plain per-key running fill: each row takes the latest non-null
    ``value_col`` at-or-before it (order = (ts, *order_col)); rows
    before the key's first observation stay null."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *_order_list(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.last(value_col, ignorenulls=True).over(w),
    )


def forward_fill_bucketed(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | list[str] = "event_id",
    out_col: str | None = None,
    bucket_us: int = BUCKET_US_DEFAULT,
) -> DataFrame:
    """Two-level forward fill with bounded window partitions (module
    docstring). Identical output to :func:`forward_fill`.

    ``order_col`` may be a composite (list) — e.g. the as-of join's
    ``(is_left, fact_seq)`` tie-break. Precondition for the composite
    case: order columns must be non-null on rows where ``value_col`` is
    non-null (the bucket summary's ``max_by`` compares them as a
    struct)."""
    out = out_col or f"{value_col}_filled"
    ocols = _order_list(order_col)
    from implementing_scds_in_hive_spark.operators.skew_route import ts_micros

    us = ts_micros(df, ts_col)
    b = df.withColumn("__bucket", F.floor(us / bucket_us))

    # Level 1: fill inside each (key, bucket).
    w1 = (
        Window.partitionBy(key_col, "__bucket")
        .orderBy(ts_col, *ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("__local", F.last(value_col, ignorenulls=True).over(w1))

    # Bucket summaries: the last non-null value per (key, bucket) —
    # max_by skips rows whose ordering expression is NULL, so null
    # observations never win. An aggregation, not a window: map-side
    # combinable, AQE-splittable.
    order_key = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            us.alias("us"),
            *[F.col(c).alias(f"o{i}") for i, c in enumerate(ocols)],
        ),
    )
    summaries = (
        b.groupBy(key_col, "__bucket")
        .agg(F.max_by(F.col(value_col), order_key).alias("__bucket_last"))
    )

    # Level 2: carry-in per bucket = last non-null bucket summary among
    # STRICTLY earlier buckets of the same key. Rows here = active
    # buckets per key — bounded regardless of per-key event volume.
    w2 = (
        Window.partitionBy(key_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.withColumn(
        "__carry_in", F.last("__bucket_last", ignorenulls=True).over(w2)
    ).select(key_col, "__bucket", "__carry_in")

    return (
        local.join(carry, [key_col, "__bucket"], "left")
        .withColumn(out, F.coalesce(F.col("__local"), F.col("__carry_in")))
        .drop("__bucket", "__local", "__carry_in")
    )


def forward_fill_auto(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | list[str] = "event_id",
    out_col: str | None = None,
    bucket_us: int = BUCKET_US_DEFAULT,
    rows_per_key_hint: int | None = None,
    skew_threshold: int | None = None,
    probe_fraction: float | None = None,
) -> DataFrame:
    """Single entry point that routes between :func:`forward_fill` and
    :func:`forward_fill_bucketed` on evidence of per-key skew (VERDICT
    r4 #2); hint beats probe, decision logged via
    ``operators/skew_route.py``. Output identical either way."""
    from implementing_scds_in_hive_spark.operators.skew_route import (
        decide_skew_plan,
    )

    d = decide_skew_plan(
        df,
        [key_col],
        rows_per_key_hint=rows_per_key_hint,
        threshold=skew_threshold,
        probe_fraction=probe_fraction,
        operator="forward_fill",
    )
    if d.bucketed:
        return forward_fill_bucketed(
            df,
            value_col,
            key_col=key_col,
            ts_col=ts_col,
            order_col=order_col,
            out_col=out_col,
            bucket_us=bucket_us,
        )
    return forward_fill(
        df, value_col, key_col=key_col, ts_col=ts_col, order_col=order_col, out_col=out_col
    )


def linear_interpolate(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | list[str] = "event_id",
    out_col: str | None = None,
) -> DataFrame:
    """Per-key LINEAR interpolation of null gaps: a missing value
    between two observations takes
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` over
    the microsecond timeline — the time-series repair for continuous
    signals where LOCF (:func:`forward_fill`) would introduce steps.
    Leading/trailing gaps (no observation on one side) stay null — no
    extrapolation; observations pass through unchanged. Equal-timestamp
    neighbors fall back to the previous observation (zero-width gap).

    Plan shape: four ``ignorenulls`` window expressions over the same
    two frames forward_fill uses (running last + reversed running
    first) — two WindowExec passes per key partition, no extra shuffle
    beyond the key partitioning, and the same skew caveat as the other
    per-key windows (bucket via ``forward_fill_bucketed``'s pattern if
    one key dominates)."""
    out = out_col or f"{value_col}_interp"
    order = [ts_col, *_order_list(order_col)]
    v = F.col(value_col)
    t = F.unix_micros(F.col(ts_col))
    wp = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            prev_v.isNotNull() & next_v.isNotNull() & (next_t == prev_t), prev_v
        )
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v
            + (next_v - prev_v)
            * ((t - prev_t).cast("double") / (next_t - prev_t).cast("double")),
        )
    )
    return df.withColumn(out, interp)
