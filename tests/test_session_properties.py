"""Property test: the two sessionizer implementations agree (r2 verdict
optional-hardening #7).

The engine sessionizes two ways:

* batch gaps-and-islands (``pipeline_ops.q_sessionize``'s core): a new
  session starts when the microsecond gap to the previous event is
  STRICTLY greater than the gap duration;
* the built-in ``session_window`` (``streaming/windows.session_windows``,
  run in batch mode — watermark a no-op).

Probed boundary semantics (and pinned here): the built-in MERGES two
events exactly ``gap`` apart and SPLITS at gap + 1 microsecond — i.e.
the same strictly-greater rule. Given that, on ANY event set the two
must produce identical sessions with ``builtin.session_end ==
batch last event + gap``. Random event sets drawn by hypothesis include
sub-second fractions and planted exact-boundary gaps (±1 microsecond
around 1800 s), the class that r2 verdict #3 flagged as the latent
truncation hazard.
"""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import Window

GAP_US = 1_800_000_000  # 30 minutes
T0 = datetime(2024, 3, 1)

# Per-user sequences of inter-event gaps (microseconds). Weighted toward
# the boundary: exact 30-minute gaps, one-microsecond excursions either
# side, plus ordinary short/long gaps.
gap_us = st.one_of(
    st.just(GAP_US),
    st.just(GAP_US - 1),
    st.just(GAP_US + 1),
    st.integers(min_value=0, max_value=10 * GAP_US),
)
user_events = st.lists(gap_us, min_size=1, max_size=12)
event_sets = st.dictionaries(
    st.integers(min_value=1, max_value=5), user_events, min_size=1, max_size=4
)


def _batch_sessionize(e, gap_us: int):
    """The q_sessionize core on an arbitrary events DataFrame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    )
    sess = F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("session_seq", sess)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=event_sets)
def test_batch_sessionize_agrees_with_builtin_session_window(spark, events):
    from implementing_scds_in_hive_spark.streaming.windows import session_windows

    rows, eid = [], 0
    for uid, gaps in events.items():
        ts = T0
        for g in gaps:
            ts = ts + timedelta(microseconds=g)
            eid += 1
            rows.append((eid, uid, ts, 1.0))
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )

    batch = {
        (r["user_id"], r["session_start"]): r
        for r in _batch_sessionize(e, GAP_US).collect()
    }
    builtin = {
        (r["user_id"], r["session_start"]): r
        for r in session_windows(e, gap="30 minutes").collect()
    }

    assert set(batch) == set(builtin)
    for k, b in batch.items():
        s = builtin[k]
        assert s["n_events"] == b["n_events"]
        # builtin end = last event + gap; batch end = last event
        assert s["session_end"] == b["session_end"] + timedelta(microseconds=GAP_US)
