"""Streaming change-feed subscription (streaming/changefeed.py): a
downstream consumer follows a snapshot table's commit log via a
persisted-watermark poll, with the same recovery-class discipline as
the other streaming faces — idempotent apply per (from, to) version
pair, atomic watermark advance AFTER apply, replay-safe crash points.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.sources.registry import load_table
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    snapshot_changes,
    vacuum,
    write_snapshot,
)
from implementing_scds_in_hive_spark.streaming.changefeed import (
    follow_changes_stream,
    poll_changes_once,
    read_watermark,
)

SF = "/root/testdata/sf0.001"
KEY = ["c_custkey"]


def _cust(spark):
    return load_table(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def _apply_to(out_path):
    """The idempotent-upsert apply: each (from, to) batch overwrites its
    own to_version partition, so a replay is byte-identical."""

    def apply_fn(changes, from_v, to_v):
        (
            changes.withColumn("to_version", F.lit(to_v))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("to_version")
            .parquet(out_path)
        )

    return apply_fn


def _canon(df, drop=("to_version",)):
    cols = [c for c in df.columns if c not in drop]
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_poll_applies_and_is_idempotent(spark, tmp_path):
    source = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    c = _cust(spark)
    k = F.col("c_custkey")

    write_snapshot(c.where(k % 7 != 0), source)
    rep = poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    assert rep == {"applied": True, "from": None, "to": 1}
    assert read_watermark(state) == 1
    # initial load arrives as inserts
    first = spark.read.parquet(out).where("to_version = 1")
    assert first.where("op <> 'I'").count() == 0

    # two more source versions; ONE poll spans both (diff 1 -> 3)
    write_snapshot(c.where(k % 11 != 0), source)
    write_snapshot(
        c.where(k % 11 != 0).withColumn("c_acctbal", F.col("c_acctbal") + 5.0),
        source,
    )
    rep = poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    assert rep == {"applied": True, "from": 1, "to": 3}
    got = spark.read.parquet(out).where("to_version = 3")
    expected = snapshot_changes(spark, source, 1, 3, KEY)
    assert _canon(got) == _canon(expected, drop=())

    # nothing new: no-op, watermark unchanged
    rep = poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    assert rep == {"applied": False, "from": 3, "to": 3}


def test_crash_after_apply_replays_identically(spark, tmp_path):
    source = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    c = _cust(spark)

    write_snapshot(c.where(F.col("c_custkey") % 2 == 0), source)
    poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    write_snapshot(c, source)

    def crash(_bid, phase):
        if phase == "post_apply":
            raise RuntimeError("die before watermark")

    with pytest.raises(RuntimeError, match="die before"):
        poll_changes_once(spark, source, KEY, _apply_to(out),
                          state_dir=state, crash_hook=crash)
    assert read_watermark(state) == 1  # watermark did NOT advance

    rep = poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    assert rep == {"applied": True, "from": 1, "to": 2}
    got = spark.read.parquet(out).where("to_version = 2")
    expected = snapshot_changes(spark, source, 1, 2, KEY)
    assert _canon(got) == _canon(expected, drop=())


def test_vacuumed_past_watermark_raises_rebootstrap(spark, tmp_path):
    source = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    c = _cust(spark)

    write_snapshot(c.limit(100), source)
    poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)
    write_snapshot(c.limit(200), source)
    write_snapshot(c.limit(300), source)
    vacuum(source, keep_last=1, grace_seconds=0.0)  # drops v1, v2
    with pytest.raises(RuntimeError, match="re-bootstrap"):
        poll_changes_once(spark, source, KEY, _apply_to(out), state_dir=state)


def test_stream_subscription_follows_commits(spark, tmp_path):
    """The real Structured-Streaming face: a rate ticker drives the
    poll; publishing new versions while the query runs advances the
    watermark to the source's latest, and the applied partitions match
    the batch replay of every consecutive diff."""
    source = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    c = _cust(spark)
    k = F.col("c_custkey")

    write_snapshot(c.where(k % 3 == 0), source)
    q = follow_changes_stream(
        spark, source, KEY, _apply_to(out),
        state_dir=state, checkpoint_dir=ckpt, poll_interval="0 seconds",
    )
    try:
        deadline = time.time() + 60
        while read_watermark(state) != 1 and time.time() < deadline:
            time.sleep(0.2)
        assert read_watermark(state) == 1

        write_snapshot(c.where(k % 3 != 2), source)
        while read_watermark(state) != 2 and time.time() < deadline:
            time.sleep(0.2)
        assert read_watermark(state) == 2
    finally:
        q.stop()

    assert latest_version(source) == 2
    got = spark.read.parquet(out).where("to_version = 2")
    expected = snapshot_changes(spark, source, 1, 2, KEY)
    assert _canon(got) == _canon(expected, drop=())
    assert os.path.isdir(ckpt)


def test_follow_view_stream_tracks_live_source(spark, tmp_path):
    """changefeed → matview composition (VERDICT r7 #8): a live
    StreamingQuery keeps a persisted rollup view equal to a from-scratch
    recompute across concurrent source commits, and a kill/restart with
    a FRESH checkpoint resumes from the view manifest's own watermark
    (no sidecar state), consistent with the recovery-class catalogue."""
    from implementing_scds_in_hive_spark.operators.incremental import (
        event_rollup,
    )
    from implementing_scds_in_hive_spark.operators.matview import (
        view_watermark,
    )
    from implementing_scds_in_hive_spark.sources.registry import load_table
    from implementing_scds_in_hive_spark.sources.snapshot import read_table
    from implementing_scds_in_hive_spark.streaming.changefeed import (
        follow_view_stream,
    )

    source = str(tmp_path / "src")
    view = str(tmp_path / "view")
    e = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )

    def _wait_for(wm, deadline_s=60):
        deadline = time.time() + deadline_s
        while view_watermark(view) != wm and time.time() < deadline:
            time.sleep(0.2)
        assert view_watermark(view) == wm

    def _assert_current():
        expected = event_rollup(read_table(spark, source))
        got = read_table(spark, view)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        )

    write_snapshot(e.where(F.col("event_id") % 3 == 0), source)
    q = follow_view_stream(
        spark, source, view, ["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt1"), poll_interval="0 seconds",
    )
    try:
        _wait_for(1)
        _assert_current()
        # concurrent source commits while the query runs: updates,
        # deletes AND inserts between consecutive versions
        write_snapshot(e.where(F.col("event_id") % 3 != 1), source)
        _wait_for(2)
        _assert_current()
        write_snapshot(
            e.withColumn("value", F.col("value") + 1.0), source
        )
        _wait_for(3)
        _assert_current()
    finally:
        q.stop()

    # crash chain: source moves while no subscriber runs; a restart with
    # a FRESH checkpoint catches up from the view's manifest watermark
    write_snapshot(e.where(F.col("event_id") % 5 != 0), source)
    q2 = follow_view_stream(
        spark, source, view, ["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt2"), poll_interval="0 seconds",
    )
    try:
        _wait_for(4)
        _assert_current()
    finally:
        q2.stop()


def test_poll_crash_sweep_every_batch_and_phase(spark, tmp_path):
    """r13 (VERDICT r12 next-round #5): extend the single-point crash
    tests to a full (poll, phase) sweep like the merge/bloom sweeps —
    inject a death ONCE at every phase of every applying poll of a
    fixed publish/poll schedule, retry the poll (the restart), and
    require the final output — every to_version partition AND the
    watermark — byte-equal to the crash-free run. The schedule makes
    each poll span a DIFFERENT version window (initial load, single
    version, multi-version catch-up) so each recovery class is hit at
    each span shape; the apply is the idempotent per-(from,to)
    partition overwrite every sink in streaming/ uses."""
    c = _cust(spark)
    k = F.col("c_custkey")

    # publish steps interleaved with polls: None->1 (initial load),
    # 1->2 (update+delete), 2->4 (multi-version span with an insert)
    versions = [
        c.where(k % 2 == 0),
        c.where((k % 2 == 0) & (k % 7 != 0)).withColumn(
            "c_acctbal", F.col("c_acctbal") + 1.0
        ),
        c.where(k % 7 != 0),
        c.withColumn("c_acctbal", F.col("c_acctbal") * 2.0),
    ]
    # poll after publishing version index i (0-based): spans above
    schedule = [0, 1, 3]

    def run(tag, crash_at=None):
        """crash_at = (poll_index, phase): raise once there, then retry
        the same poll (the restart a supervisor would do)."""
        source = str(tmp_path / f"src_{tag}")
        state = str(tmp_path / f"state_{tag}")
        out = str(tmp_path / f"out_{tag}")
        published = -1
        for poll_i, upto in enumerate(schedule):
            while published < upto:
                published += 1
                write_snapshot(versions[published], source)
            fired = {"done": False}

            def hook(_bid, phase, _poll=poll_i, _fired=fired):
                if (
                    crash_at is not None
                    and (_poll, phase) == crash_at
                    and not _fired["done"]
                ):
                    _fired["done"] = True
                    raise RuntimeError(f"injected death at {crash_at}")

            try:
                poll_changes_once(
                    spark, source, KEY, _apply_to(out),
                    state_dir=state, crash_hook=hook,
                )
            except RuntimeError:
                assert fired["done"], "unexpected error, not the injection"
                # restart: the SAME poll re-runs against the same source
                poll_changes_once(
                    spark, source, KEY, _apply_to(out), state_dir=state,
                )
        # drained: one extra poll must be a no-op
        rep = poll_changes_once(
            spark, source, KEY, _apply_to(out), state_dir=state,
        )
        assert rep["applied"] is False
        return read_watermark(state), _canon(spark.read.parquet(out), drop=())

    base_wm, base_out = run("base")
    assert base_wm == len(versions)
    for poll_i in range(len(schedule)):
        for phase in ("pre_apply", "post_apply", "post_watermark"):
            wm, got = run(f"{poll_i}_{phase}", crash_at=(poll_i, phase))
            assert wm == base_wm, f"watermark diverged at {poll_i}/{phase}"
            assert got == base_out, f"output diverged at {poll_i}/{phase}"


def test_follow_view_stream_restart_after_injected_commit_death(
    spark, tmp_path, monkeypatch
):
    """r14 (VERDICT r13 next-round #4, streaming face): a LIVE
    ``follow_view_stream`` whose tick dies mid view-commit (injected
    manifest-link failure) terminates the query; a supervisor-style
    restart with a FRESH checkpoint must converge the view to a
    from-scratch rollup with no double fold — the manifest-watermark
    recovery contract exercised through the actual StreamingQuery, not
    just the batch face."""
    import os as _os
    import time as _time

    import implementing_scds_in_hive_spark.sources.snapshot as snap
    from implementing_scds_in_hive_spark.operators.incremental import (
        event_rollup,
    )
    from implementing_scds_in_hive_spark.operators.matview import (
        view_watermark,
    )
    from implementing_scds_in_hive_spark.sources.registry import load_table
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_table,
        write_snapshot,
    )
    from implementing_scds_in_hive_spark.streaming.changefeed import (
        follow_view_stream,
    )

    source = str(tmp_path / "src")
    view = str(tmp_path / "view")
    e = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    write_snapshot(e.where(F.col("event_id") % 3 == 0), source)

    real_link = _os.link
    fired = {"done": False}

    def flaky(src_p, dst_p):
        # only the VIEW's commits die — the test thread keeps publishing
        # source versions through the same global os.link concurrently
        if view in str(dst_p) and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected stream view-commit death")
        return real_link(src_p, dst_p)

    monkeypatch.setattr(snap.os, "link", flaky)
    try:
        q = follow_view_stream(
            spark, source, view, ["event_id"],
            checkpoint_dir=str(tmp_path / "ckpt1"),
            poll_interval="0 seconds",
        )
        deadline = _time.time() + 60
        while q.isActive and _time.time() < deadline:
            _time.sleep(0.2)
        assert not q.isActive, "query should die on the injected commit death"
        assert fired["done"]
    finally:
        monkeypatch.setattr(snap.os, "link", real_link)
        try:
            q.stop()
        except Exception:
            pass

    # the source moves on while no subscriber runs
    write_snapshot(e.where(F.col("event_id") % 3 != 1), source)

    # supervisor restart: fresh checkpoint, state comes from the view
    # manifest alone
    q2 = follow_view_stream(
        spark, source, view, ["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt2"), poll_interval="0 seconds",
    )
    try:
        deadline = _time.time() + 60
        while view_watermark(view) != 2 and _time.time() < deadline:
            _time.sleep(0.2)
        assert view_watermark(view) == 2
    finally:
        q2.stop()
    expected = event_rollup(read_table(spark, source))
    got = read_table(spark, view)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
