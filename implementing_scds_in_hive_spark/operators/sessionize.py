"""Sessionization (gaps-and-islands), with a skew-bounded two-level plan.

``sessionize`` is the plain formulation used by the driver query
(plans/pipeline_ops.q_sessionize): two windows partitioned by user. Its
scale hazard is a power-law user — bot traffic at 100 TB — whose entire
event history lands in ONE window task, and AQE's skew-splitting does
NOT apply to window exchanges (it only splits sort-merge-join and
aggregation shuffles; a window's partition must stay whole).

``sessionize_bucketed`` is the mitigation: a hierarchical two-level
plan whose window partitions are bounded regardless of per-user event
volume.

Level 1 — partition by ``(user, time_bucket)``: the gaps-and-islands
scan runs inside each bucket, so a task sees at most one bucket's worth
of one user's events (a bot emitting 10M events/year over 1-day buckets
=> ~27k events/task instead of 10M).

Level 2 — merge mini-sessions across bucket boundaries at SESSION
granularity. Bucket boundaries force artificial splits; two adjacent
mini-sessions of the same user merge iff the silence between them is
<= gap (the same strictly-greater split rule). The row count entering
this window is bounded by construction: a bucket can hold at most
``bucket/gap + 1`` sessions per user (each split needs > gap of
silence), so the bot above contributes <= 49 rows/day with a 30-minute
gap — 5 orders of magnitude below its event count. The heavy key is
tamed by data reduction, not redistribution.

Exactness: level-2 merging reconstructs the plain sessionizer's islands
bit-for-bit — a session is a maximal chain of events with inter-event
gaps <= gap; bucketing only cuts chains at bucket edges, and the merge
rejoins exactly those cuts (equal timestamps share a bucket, so order
ties never span buckets). ``tests/test_skew_sessionize.py`` asserts
exact agreement on the driver corpus, on a planted heavy hitter, and on
hypothesis-generated boundary cases (gap±1 microsecond).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_US_DEFAULT = 1_800_000_000  # 30 minutes
BUCKET_US_DEFAULT = 86_400_000_000  # 1 day


def sessionize(
    events: DataFrame,
    *,
    gap_us: int = GAP_US_DEFAULT,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Plain per-user gaps-and-islands (the driver query's core): a
    silence STRICTLY greater than ``gap_us`` starts a new session.
    Output: (user, session_seq, n_events, session_start, session_end).
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "__new", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    )
    seq = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("session_seq", seq)
        .groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def sessionize_bucketed(
    events: DataFrame,
    *,
    gap_us: int = GAP_US_DEFAULT,
    bucket_us: int = BUCKET_US_DEFAULT,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Two-level sessionizer with bounded window partitions (see module
    docstring). Identical output to :func:`sessionize` for any input;
    ``bucket_us`` must exceed ``gap_us`` (a bucket shorter than the gap
    would still be correct, but pointless — more merge work).
    """
    if bucket_us <= gap_us:
        raise ValueError(
            f"bucket_us ({bucket_us}) must exceed gap_us ({gap_us})"
        )
    us = F.unix_micros(F.col(ts_col))

    # Level 1: gaps-and-islands inside each (user, bucket).
    w1 = Window.partitionBy(user_col, "__bucket").orderBy(ts_col, order_col)
    gap1 = us - F.lag(us).over(w1)
    flagged = events.withColumn("__bucket", F.floor(us / bucket_us)).withColumn(
        "__new", F.when(gap1.isNull() | (gap1 > gap_us), 1).otherwise(0)
    )
    mini_seq = F.sum("__new").over(
        w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    minis = (
        flagged.withColumn("__mini", mini_seq)
        .groupBy(user_col, "__bucket", "__mini")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(ts_col).alias("__start"),
            F.max(ts_col).alias("__end"),
            F.min(us).alias("__start_us"),
            F.max(us).alias("__end_us"),
        )
    )

    # Level 2: merge across bucket edges at session granularity. Mini
    # starts are strictly increasing per user (equal timestamps share a
    # bucket and a mini), so __start_us is a total order.
    w2 = Window.partitionBy(user_col).orderBy("__start_us")
    gap2 = F.col("__start_us") - F.lag("__end_us").over(w2)
    merged_flag = F.when(gap2.isNull() | (gap2 > gap_us), 1).otherwise(0)
    seq = F.sum(merged_flag).over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        minis.withColumn("session_seq", seq)
        .groupBy(user_col, "session_seq")
        .agg(
            F.sum("__n").alias("n_events"),
            F.min("__start").alias("session_start"),
            F.max("__end").alias("session_end"),
        )
    )


def sessionize_auto(
    events: DataFrame,
    *,
    gap_us: int = GAP_US_DEFAULT,
    bucket_us: int = BUCKET_US_DEFAULT,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    rows_per_key_hint: int | None = None,
    skew_threshold: int | None = None,
    probe_fraction: float | None = None,
) -> DataFrame:
    """Single entry point that routes between :func:`sessionize` and
    :func:`sessionize_bucketed` on evidence of per-user skew (VERDICT r4
    #2): an explicit ``rows_per_key_hint`` wins, else a cheap
    max-rows-per-key probe (optionally sampled via ``probe_fraction``);
    the decision is logged by ``operators/skew_route.py``. Output is
    identical either way — only the physical plan differs."""
    from implementing_scds_in_hive_spark.operators.skew_route import (
        decide_skew_plan,
    )

    d = decide_skew_plan(
        events,
        [user_col],
        rows_per_key_hint=rows_per_key_hint,
        threshold=skew_threshold,
        probe_fraction=probe_fraction,
        operator="sessionize",
    )
    if d.bucketed:
        return sessionize_bucketed(
            events,
            gap_us=gap_us,
            bucket_us=bucket_us,
            user_col=user_col,
            ts_col=ts_col,
            order_col=order_col,
        )
    return sessionize(
        events, gap_us=gap_us, user_col=user_col, ts_col=ts_col, order_col=order_col
    )


def detect_gaps(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap_seconds: int = 3600,
) -> DataFrame:
    """Silence intervals per key: consecutive-event spacings larger than
    ``min_gap_seconds`` — the data-downtime / liveness face of the
    gaps-and-islands family (``sessionize`` is the islands face; a gap
    here is exactly a session BOUNDARY whose spacing is reported).
    Output: (key, gap_start, gap_end, gap_seconds).

    One lag window per key — the same partition-skew class as
    sessionize; :func:`detect_gaps_bucketed` is the two-level bounded
    plan for hot keys and :func:`detect_gaps_auto` routes between the
    two on evidence, exactly like the rest of the window family."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    return (
        events.select(
            key_col,
            F.lag(ts_col).over(w).alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
        )
        .withColumn(
            "gap_seconds",
            F.round(
                F.col("gap_end").cast("double") - F.col("gap_start").cast("double"), 3
            ),
        )
        .where(F.col("gap_seconds") > min_gap_seconds)
    )


def detect_gaps_bucketed(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap_seconds: int = 3600,
    bucket_us: int = BUCKET_US_DEFAULT,
) -> DataFrame:
    """Skew-bounded :func:`detect_gaps`: identical output, window
    partitions bounded by time-bucket instead of one partition per key.

    The consecutive-pair chain per key splits exactly into (a) pairs
    inside one time bucket — a lag window over (key, bucket) — and (b)
    one boundary pair per adjacent pair of NON-EMPTY buckets, recovered
    from per-bucket (min_ts, max_ts) summaries: a lag window over the
    bucket summaries, whose per-key partition is bounded by
    time-span/bucket_us rows rather than event count. Equal-timestamp
    ties share a bucket, so no pair is double-counted. Same
    construction as sessionize_bucketed; same reason AQE can't do this
    for us (window partitions cannot be skew-split)."""
    from implementing_scds_in_hive_spark.operators.skew_route import ts_micros

    us = ts_micros(events, ts_col)
    based = events.select(
        key_col, F.col(ts_col), F.floor(us / bucket_us).alias("__bucket")
    )
    w1 = Window.partitionBy(key_col, "__bucket").orderBy(ts_col)
    intra = based.select(
        key_col,
        F.lag(ts_col).over(w1).alias("gap_start"),
        F.col(ts_col).alias("gap_end"),
    ).where(F.col("gap_start").isNotNull())
    summaries = based.groupBy(key_col, "__bucket").agg(
        F.min(ts_col).alias("__first"), F.max(ts_col).alias("__last")
    )
    w2 = Window.partitionBy(key_col).orderBy("__bucket")
    boundary = summaries.select(
        key_col,
        F.lag("__last").over(w2).alias("gap_start"),
        F.col("__first").alias("gap_end"),
    ).where(F.col("gap_start").isNotNull())
    return (
        intra.unionByName(boundary)
        .withColumn(
            "gap_seconds",
            F.round(
                F.col("gap_end").cast("double") - F.col("gap_start").cast("double"), 3
            ),
        )
        .where(F.col("gap_seconds") > min_gap_seconds)
    )


def detect_gaps_auto(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap_seconds: int = 3600,
    bucket_us: int = BUCKET_US_DEFAULT,
    rows_per_key_hint: int | None = None,
    skew_threshold: int | None = None,
    probe_fraction: float | None = None,
) -> DataFrame:
    """Routed entry point for gap detection: plain lag window for
    well-distributed keys, the two-level bucketed plan on evidence of
    skew — same contract as sessionize_auto / forward_fill_auto."""
    from implementing_scds_in_hive_spark.operators.skew_route import (
        decide_skew_plan,
    )

    d = decide_skew_plan(
        events,
        [key_col],
        rows_per_key_hint=rows_per_key_hint,
        threshold=skew_threshold,
        probe_fraction=probe_fraction,
        operator="detect_gaps",
    )
    if d.bucketed:
        return detect_gaps_bucketed(
            events,
            key_col=key_col,
            ts_col=ts_col,
            min_gap_seconds=min_gap_seconds,
            bucket_us=bucket_us,
        )
    return detect_gaps(
        events, key_col=key_col, ts_col=ts_col, min_gap_seconds=min_gap_seconds
    )
