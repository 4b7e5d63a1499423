"""Incremental aggregate maintenance: fold a delta batch into an
existing rollup without recomputing history.

At 100 TB the hourly/daily rollup of an append-only event stream is
never recomputed from scratch — each new partition of events is
aggregated alone (touching only the new data) and merged into the
materialized rollup by re-aggregating the union on the group keys.
Correct for any commutative-monoid aggregate (count, sum, min, max;
count-distinct needs a sketch — see streaming/windows.py's HLL note).

The algebraic invariant — ``merge(rollup(A), B) == rollup(A ∪ B)`` —
is exactly what the driver oracle checks: the incremental query
computes the left side, the DuckDB SQL computes the right side over all
events, and the value hashes must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_rollup(events: DataFrame, *, ts_col: str = "ts", bucket: str = "1 hour") -> DataFrame:
    """The additive rollup: (bucket, event_type) -> count + value sum.
    Same grain as pipeline_ops.q_event_hourly_rollup minus the
    non-additive distinct-user count."""
    # decimal accumulation: double sums are order-dependent (partial
    # aggregation order differs run to run); decimal keeps the
    # incremental and one-shot paths bit-equal
    return (
        events.groupBy(
            F.window(ts_col, bucket).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket_start"), "event_type", "n_events", "total_value"
        )
    )


def merge_rollup(existing: DataFrame, delta_events: DataFrame, **kwargs) -> DataFrame:
    """Fold a new batch of raw events into a materialized rollup: the
    delta aggregates alone (one pass over NEW data only), then the union
    re-aggregates on the group keys. Buckets untouched by the delta pass
    through the final aggregation unchanged; only co-grouped rows merge.
    At scale: if the rollup table is bucketed/partitioned by
    bucket_start, the merge shuffles only delta-touched partitions."""
    delta = event_rollup(delta_events, **kwargs)
    return (
        existing.unionByName(delta)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )

def rollup_signed_deltas(deltas: DataFrame, *, ts_col: str = "ts",
                         bucket: str = "1 hour", weight_col: str = "__w") -> DataFrame:
    """Aggregate a SIGNED delta batch (rows carrying ±1 weights, e.g.
    ``sources/snapshot.py:snapshot_deltas`` between two table versions)
    at the rollup grain: counts become ``sum(w)``, value sums become
    ``sum(value*w)`` — a deleted row contributes its exact negation, an
    update contributes old-negated + new. Same decimal discipline as
    :func:`event_rollup` so incremental and one-shot stay bit-equal."""
    w = F.col(weight_col).cast("long")
    return (
        deltas.groupBy(F.window(ts_col, bucket).alias("win"), "event_type")
        .agg(
            F.sum(w).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)") * w).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket_start"), "event_type", "n_events", "total_value"
        )
    )


def merge_rollup_signed(existing: DataFrame, deltas: DataFrame, **kwargs) -> DataFrame:
    """Maintain a materialized rollup under UPDATES AND DELETES: fold a
    signed delta batch (see :func:`rollup_signed_deltas`) into the
    rollup and drop groups whose support reaches zero — the Z-set
    generalization of :func:`merge_rollup`, which only handles
    append-only feeds. The maintained table always equals a from-scratch
    :func:`event_rollup` over the table's current version (pinned by
    tests/test_incremental.py across snapshot versions)."""
    delta = rollup_signed_deltas(deltas, **kwargs)
    return (
        existing.unionByName(delta)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
        .where(F.col("n_events") > 0)
    )
