"""Bucketized range join: facts matched to containing time intervals.

Spark plans a non-equi join predicate (``start <= ts AND ts < end``)
with no equi-conjunct as a BroadcastNestedLoopJoin — O(|facts| x
|intervals|) comparisons, and a full cartesian shuffle when neither
side broadcasts. The bucketized form restores an equi-join: floor fact
timestamps to a granule, explode each interval into the granules it
overlaps, equi-join on the granule, and keep the exact containment
predicate as a residual filter. Each fact lands in exactly ONE granule
and an interval appears at most once per granule, so no dedup step is
needed — the bucket join over-matches only within a granule and the
residual filter finishes the job.

Cost model: the equi-join shuffles on the granule key (or broadcasts
the exploded intervals when they are small); each interval contributes
``ceil(duration / granule) + 1`` rows. Pick the granule near the median
interval duration — too fine explodes the interval side, too coarse
degrades toward per-granule mini-cartesians. Long-tail intervals (a
"promo" lasting months) should be split out and handled with a plain
broadcast predicate join; the granule bound makes the blow-up explicit
rather than silent.

The result is semantically identical to the plain predicate join, so
correctness oracles stay engine-independent SQL (no internal replay
needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketized_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    granule_seconds: int = 3600,
    join_type: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each fact row to every interval row whose half-open
    ``[start_col, end_col)`` contains ``ts_col``. Column names must be
    disjoint between the two inputs. ``join_type``: ``inner`` or
    ``left`` (facts with no containing interval keep NULLs)."""
    if join_type not in ("inner", "left"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    if granule_seconds <= 0:
        # floor(ts / 0) is NULL under non-ANSI arithmetic, so the
        # bucket equi-condition never matches and an inner join would
        # silently return ZERO rows (r11 review)
        raise ValueError(
            f"granule_seconds must be positive, got {granule_seconds}"
        )
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; both sides have {sorted(overlap)}")

    g = F.lit(granule_seconds)
    fb = facts.withColumn("__fb", F.floor(F.unix_timestamp(F.col(ts_col)) / g))
    ib = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / g),
                F.floor(F.unix_timestamp(F.col(end_col)) / g),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    cond = (
        (F.col("__fb") == F.col("__ib"))
        & (F.col(start_col) <= F.col(ts_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return fb.join(ib, cond, join_type).drop("__fb", "__ib")
