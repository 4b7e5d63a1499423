"""Automatic plain-vs-bucketed routing for the window-partitioned
operators (VERDICT r4 next-round #2).

``sessionize`` / ``forward_fill`` / ``asof_join`` each have two plans:
the plain single-window form (fastest when no key is pathological) and
the two-level bucketed form whose window partitions stay bounded under
a power-law key — the one skew class AQE cannot split (window exchanges
are exempt from skew-join handling). Until now the CALLER had to know
which to pick; these helpers make the choice from evidence instead:

* an explicit ``rows_per_key_hint`` (max rows any key holds) when the
  caller already knows — e.g. from table stats or a previous run's
  metrics — costs nothing;
* otherwise a probe job: ``groupBy(key).count().agg(max)``. The shuffle
  carries one row per distinct key AFTER map-side partial aggregation —
  O(|keys|), not O(|rows|) — and ``probe_fraction`` samples the scan
  down further when even that is too dear (a key with millions of rows
  is statistically unmissable in a 1% sample; the estimate divides by
  the fraction).

The router picks the bucketed plan when the (estimated) max rows/key
exceeds ``threshold`` (default 250k — a window partition that size
sorts in well under a second; past it, one task owns minutes of work
while 999 executors idle). The decision and the evidence are logged on
the module logger so a pipeline's choice is auditable.

NOTE: the probe triggers one extra pass over ``df``'s lineage. Callers
probing an expensive upstream should persist it first or pass the hint
— the same discipline as any multi-pass consumer.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

SKEW_THRESHOLD_DEFAULT = 250_000


@dataclass(frozen=True)
class SkewDecision:
    bucketed: bool
    max_rows_per_key: int  # exact, or the scaled estimate when sampled
    threshold: int
    source: str  # "hint" | "probe" | "probe_sampled"


def ts_micros(df: DataFrame, ts_col: str):
    """Monotonic epoch-microsecond expression for BUCKET ASSIGNMENT in
    the two-level skew-bounded plans: TimestampType (and DATE) via
    ``unix_micros``, integral epoch columns pass through as-is. The
    plain window variants accept any orderable ts — the bucketed tier
    must not start throwing data-type errors only on the day skew
    routing selects it (r11 review: a data-dependent, routing-triggered
    failure). An integral column in a non-microsecond unit merely
    shifts the bucket granularity; the two-level reconstruction is
    bucket-size-agnostic, so results stay identical to the plain plan.
    Fractional/other types raise with a clear message (truncating them
    for the bucket order key could flip same-bucket winners)."""
    from pyspark.sql.types import (
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        TimestampNTZType,
        TimestampType,
    )

    dt = df.schema[ts_col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(ts_col))
    if isinstance(dt, DateType):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return F.col(ts_col).cast("long")
    raise ValueError(
        f"bucketed window plans need a timestamp/date/integral time "
        f"column for bucket assignment; {ts_col!r} is {dt.simpleString()}"
        f" — cast it to timestamp or epoch integers first"
    )


def probe_max_rows_per_key(
    df: DataFrame, key_cols: list[str], *, probe_fraction: float | None = None
) -> int:
    d = df.sample(probe_fraction, seed=7) if probe_fraction else df
    row = d.groupBy(*key_cols).count().agg(F.max("count").alias("m")).first()
    m = row["m"] or 0
    return int(m / probe_fraction) if probe_fraction else m


def decide_skew_plan(
    df: DataFrame,
    key_cols: list[str],
    *,
    rows_per_key_hint: int | None = None,
    threshold: int | None = None,
    probe_fraction: float | None = None,
    operator: str = "window-op",
) -> SkewDecision:
    if threshold is None:  # callers pass their knob through untouched
        threshold = SKEW_THRESHOLD_DEFAULT
    if rows_per_key_hint is not None:
        mx, source = rows_per_key_hint, "hint"
    else:
        mx = probe_max_rows_per_key(df, key_cols, probe_fraction=probe_fraction)
        source = "probe_sampled" if probe_fraction else "probe"
    decision = SkewDecision(
        bucketed=mx > threshold, max_rows_per_key=mx, threshold=threshold, source=source
    )
    log.info(
        "%s skew routing: max rows/key=%d (%s) threshold=%d -> %s plan",
        operator,
        mx,
        source,
        threshold,
        "bucketed" if decision.bucketed else "plain",
    )
    return decision
