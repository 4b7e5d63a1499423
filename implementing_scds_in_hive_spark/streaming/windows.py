"""Event-time windowed aggregation with watermarks (SURVEY §2.9).

The batch twin of this plan is ``pipeline_ops.q_event_hourly_rollup``;
here the same rollup runs incrementally over a stream with late-data
handling the batch world gets for free by re-running. Watermark = how
long to keep a window's partial aggregate alive for stragglers; after it
passes, the window finalizes and its state is dropped — bounded state is
what makes this run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark, path: str, *, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory of events parquet files —
    the local stand-in for a Kafka topic; same downstream plan either way."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_rollup(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window, event_type) rollup. On a stream the watermark bounds
    state; on a batch DataFrame the same code degenerates to a plain
    group-by (withWatermark is a no-op in batch) — one definition, both
    execution modes, which is the test strategy too.

    approx_count_distinct replaces the batch twin's exact count: exact
    distinct over an unbounded stream would hold every user id in state
    forever. HLL sketch state is O(1) per window.

    ``slide`` < ``window`` gives overlapping (sliding) windows — each
    event lands in window/slide buckets; state scales accordingly.
    """
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "approx_users",
            "total_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within
    the watermark horizon (at-least-once sources re-emit on retry; this
    restores effectively-once). State holds one entry per key seen inside
    the watermark window and is evicted as the watermark advances —
    bounded, unlike an unbounded dropDuplicates. The batch twin is
    dedup.dedup_exact / dropDuplicates."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def session_windows(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows via the built-in session_window — the
    declarative version of the batch sessionizer
    (pipeline_ops.q_sessionize) and the stateful one
    (streaming/stateful.py). Spark merges overlapping session fragments
    across micro-batches in the state store."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            user_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
