"""Stream-stream joins with watermark-bounded state (SURVEY §2.7
extension — the remaining Structured Streaming operator class).

Joining two unbounded streams requires buffering both sides; without a
time bound the state grows forever. The time-range condition + both-side
watermarks let Spark evict buffered rows once they can no longer match —
the standard enrichment pattern (clicks ⋈ impressions, orders ⋈
payments) at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join events to prior events of the same key within ``max_delay``:
    ``right.ts <= left.ts <= right.ts + max_delay``. Works identically on
    batch DataFrames (watermarks are no-ops there), which is how the
    tests pin semantics. State per side is bounded by
    watermark + max_delay."""
    l, r = left.alias("l"), right.alias("r")  # noqa: E741
    lw = l.withWatermark(left_ts, watermark)
    rw = r.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"l.{left_ts}")
            <= F.col(f"r.{right_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lw.join(rw, cond, how)
