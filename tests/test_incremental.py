"""Unit test for incremental aggregate maintenance: folding deltas in
any split/order must equal the one-shot rollup (the monoid property the
driver oracle checks once; here it is checked across several splits)."""

import pytest

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


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_follow_table_maintains_rollup_over_random_version_chains(spark, tmp_path):
    """Property (hypothesis): follow a snapshot table through ANY chain
    of random edits (insert/update/delete per key per version) with
    changes_since(signed=True) + merge_rollup_signed — the maintained
    rollup equals a from-scratch rollup of every intermediate version."""
    from datetime import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from implementing_scds_in_hive_spark.operators.incremental import (
        event_rollup,
        merge_rollup_signed,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        changes_since,
        read_snapshot,
        write_snapshot,
    )

    schema = "event_id long, ts timestamp, event_type string, value double"

    # each version: key -> None (absent) | (hour, type_idx, value)
    version_strategy = st.dictionaries(
        st.integers(min_value=1, max_value=12),
        st.one_of(
            st.none(),
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=1),
                st.integers(min_value=1, max_value=50),
            ),
        ),
        min_size=1,
        max_size=12,
    )

    counter = [0]

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture,
                               HealthCheck.too_slow],
    )
    @given(chain=st.lists(version_strategy, min_size=2, max_size=3))
    def run(chain):
        counter[0] += 1
        root = str(tmp_path / f"chain_{counter[0]}")

        def rows(spec):
            return [
                (k, datetime(2024, 1, 1, h, 15), ["click", "view"][t], float(v))
                for k, val in sorted(spec.items())
                if val is not None
                for (h, t, v) in [val]
            ] or [(999, datetime(2024, 1, 1, 23, 59), "click", 0.0)]

        watermark, maintained = None, None
        for spec in chain:
            write_snapshot(spark.createDataFrame(rows(spec), schema), root)
            deltas, watermark = changes_since(
                spark, root, watermark, ["event_id"], signed=True
            )
            assert deltas is not None
            batch = event_rollup(
                deltas.where("__w = 1").drop("__w")
            ) if maintained is None else None
            maintained = (
                batch if maintained is None
                else merge_rollup_signed(maintained, deltas)
            ).localCheckpoint(eager=True)
            key = lambda r: (r["bucket_start"], r["event_type"])  # noqa: E731
            got = {key(r): (r["n_events"], r["total_value"])
                   for r in maintained.collect()}
            want = {key(r): (r["n_events"], r["total_value"])
                    for r in event_rollup(read_snapshot(spark, root)).collect()}
            assert got == want
        # idle poll: nothing new committed
        none_deltas, wm2 = changes_since(spark, root, watermark, ["event_id"], signed=True)
        assert none_deltas is None and wm2 == watermark

    run()
