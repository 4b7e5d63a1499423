"""Unit test for incremental aggregate maintenance: folding deltas in
any split/order must equal the one-shot rollup (the monoid property the
driver oracle checks once; here it is checked across several splits)."""

from datetime import datetime, timedelta

from implementing_scds_in_hive_spark.operators.incremental import (
    event_rollup,
    merge_rollup,
)

T0 = datetime(2024, 1, 1)


def _events(spark, ids):
    rows = [
        (i, T0 + timedelta(minutes=17 * i), i % 5, ["view", "buy"][i % 2], float(i) / 3, "{}")
        for i in ids
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def snap(df):
    return sorted(
        (r["bucket_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in df.collect()
    )


def test_merge_rollup_equals_oneshot_for_any_split(spark):
    full = snap(event_rollup(_events(spark, range(200))))
    for split in (1, 100, 199):
        old = event_rollup(_events(spark, range(split)))
        merged = merge_rollup(old, _events(spark, range(split, 200)))
        assert snap(merged) == full, f"split at {split}"


def test_merge_rollup_chain_of_three(spark):
    full = snap(event_rollup(_events(spark, range(150))))
    r = event_rollup(_events(spark, range(50)))
    r = merge_rollup(r, _events(spark, range(50, 100)))
    r = merge_rollup(r, _events(spark, range(100, 150)))
    assert snap(r) == full
