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


def test_signed_delta_maintenance_across_snapshot_versions(spark, tmp_path):
    """The round-6 composition: a materialized rollup maintained through
    snapshot_deltas (±1-weighted rows) across table versions with
    inserts, UPDATES and DELETES equals a from-scratch rollup of the
    final version — the maintenance story append-only merge_rollup
    cannot give."""
    from datetime import datetime

    from implementing_scds_in_hive_spark.operators.incremental import (
        event_rollup,
        merge_rollup_signed,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_snapshot,
        snapshot_deltas,
        write_snapshot,
    )

    def ev(eid, h, typ, val):
        return (eid, datetime(2024, 1, 1, h, 30), typ, float(val))

    schema = "event_id long, ts timestamp, event_type string, value double"
    v1 = [ev(1, 0, "click", 10), ev(2, 0, "click", 5), ev(3, 1, "view", 7),
          ev(4, 2, "view", 1)]
    # v2: event 2 value updated, event 3 DELETED, event 5 inserted,
    # event 4 moved to another hour (update crossing group boundaries)
    v2 = [ev(1, 0, "click", 10), ev(2, 0, "click", 9), ev(5, 1, "click", 2),
          ev(4, 3, "view", 1)]
    root = str(tmp_path / "events_t")
    write_snapshot(spark.createDataFrame(v1, schema), root)
    write_snapshot(spark.createDataFrame(v2, schema), root)

    rollup_v1 = event_rollup(read_snapshot(spark, root, version=1))
    deltas = snapshot_deltas(spark, root, 1, 2, ["event_id"])
    maintained = merge_rollup_signed(rollup_v1, deltas)
    expected = event_rollup(read_snapshot(spark, root, version=2))

    key = lambda r: (r["bucket_start"], r["event_type"])  # noqa: E731
    got = {key(r): (r["n_events"], r["total_value"]) for r in maintained.collect()}
    want = {key(r): (r["n_events"], r["total_value"]) for r in expected.collect()}
    assert got == want
    # the deleted event's (hour 1, view) group vanished entirely
    assert not any(k[1] == "view" and k[0].hour == 1 for k in got)
    # weights sanity: update emits -1/+1, delete -1, insert +1
    ws = sorted(r["__w"] for r in deltas.collect())
    assert ws == [-1, -1, -1, 1, 1, 1]
