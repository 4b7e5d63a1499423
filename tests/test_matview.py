"""Materialized-view maintenance loop (operators/matview.py): the
r6 primitives ``changes_since`` + ``merge_rollup_signed`` composed into
a persisted, crash-safe view over a REAL snapshot table.

The invariant: after every refresh, the maintained view equals a
from-scratch ``event_rollup`` over the source's CURRENT content —
across updates, deletes, inserts, appends, compaction, and crash-replay
— while each refresh only folds O(changed keys). The watermark lives in
the view's own manifest (atomic with the data), so no crash point can
double-fold a delta batch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.incremental import event_rollup
from implementing_scds_in_hive_spark.operators.matview import (
    maintain_view,
    refresh_until_current,
    view_watermark,
)
from implementing_scds_in_hive_spark.sources.registry import load_table
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    list_versions,
    load_manifest,
    read_table,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"
KEY = ["event_id"]


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _assert_current(spark, source, view):
    expected = event_rollup(read_table(spark, source))
    got = read_table(spark, view)
    assert _canon(got) == _canon(expected)


def test_initial_load_updates_deletes_inserts(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)

    write_snapshot(e.where(F.col("event_id") % 5 != 0), source)
    rep = maintain_view(spark, source, view, KEY)
    assert rep["updated"] and rep["watermark"] == 1
    _assert_current(spark, source, view)
    assert load_manifest(view, rep["view_version"])["app_meta"] == {
        "source_watermark": 1
    }

    # v2: updates (%7 value shift), deletes (%11), inserts (the %5 rows)
    v2 = e.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.col("value") + 10.0).otherwise(
            F.col("value")
        ),
    ).where(F.col("event_id") % 11 != 0)
    write_snapshot(v2, source)
    rep = maintain_view(spark, source, view, KEY)
    assert rep["updated"] and rep["watermark"] == 2
    _assert_current(spark, source, view)


def test_noop_when_current(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    write_snapshot(_events(spark).limit(500), source)
    maintain_view(spark, source, view, KEY)
    v_before = latest_version(view)
    rep = maintain_view(spark, source, view, KEY)
    assert rep == {
        "updated": False,
        "watermark": 1,
        "view_version": v_before,
        "rebuilt": False,
    }
    assert latest_version(view) == v_before


def test_view_retention_stays_bounded(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    for i in range(4):
        write_snapshot(e.where(F.col("event_id") % 5 >= i), source)
        maintain_view(spark, source, view, KEY,
                      retain_versions=2, retain_grace_seconds=0.0)
    assert len(list_versions(view)) <= 2
    _assert_current(spark, source, view)


def test_crash_before_view_commit_replays_once(spark, tmp_path, monkeypatch):
    """A refresh that dies before its manifest link leaves the view at
    the old watermark; the retry folds the SAME deterministic diff once
    — never twice (the watermark commits atomically with the data)."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    write_snapshot(e.where(F.col("event_id") % 2 == 0), source)
    maintain_view(spark, source, view, KEY)

    write_snapshot(e, source)  # v2: inserts the odd half
    real_link = os.link
    calls = {"n": 0}

    def flaky_link(src, dst):
        # the view's commit is the SECOND link this refresh performs?
        # no — the source is not committed here; the only link is the
        # view's. Crash it once.
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("crash before view manifest link")
        return real_link(src, dst)

    monkeypatch.setattr(snap.os, "link", flaky_link)
    with pytest.raises(RuntimeError, match="crash before view"):
        maintain_view(spark, source, view, KEY)
    assert view_watermark(view) == 1  # watermark did NOT advance

    rep = maintain_view(spark, source, view, KEY)  # replay
    assert rep["updated"] and rep["watermark"] == 2
    _assert_current(spark, source, view)
    # and a further refresh is a no-op (no double fold possible)
    assert maintain_view(spark, source, view, KEY)["updated"] is False
    _assert_current(spark, source, view)


def test_chain_overwrite_append_compact(spark, tmp_path):
    """The maintained view tracks a mixed op chain on the source —
    overwrites (arbitrary update/delete/insert), appends, and a
    content-preserving compaction (whose diff is empty) — matching the
    from-scratch rollup after every step."""
    from implementing_scds_in_hive_spark.sources.sinks import compact

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)

    steps = [
        lambda: write_snapshot(e.where(F.col("event_id") % 3 == 0), source),
        lambda: write_snapshot(
            e.where((F.col("event_id") % 3 == 1) & (F.col("event_id") % 2 == 0)),
            source, mode="append",
        ),
        lambda: compact(spark, source, target_rows_per_file=10_000,
                        vacuum_grace_seconds=3600.0),
        lambda: write_snapshot(
            e.withColumn("value", F.col("value") * 2.0)
            .where(F.col("event_id") % 4 != 0),
            source,
        ),
        # re-insert keys the previous overwrite deleted (%4==0): appends
        # must not duplicate live keys — the change feed is a KEYED
        # table diff (key unique per version, as documented)
        lambda: write_snapshot(
            e.where((F.col("event_id") % 9 == 2) & (F.col("event_id") % 4 == 0)),
            source, mode="append",
        ),
    ]
    for step in steps:
        step()
        rep = refresh_until_current(spark, source, view, KEY)
        assert rep["watermark"] == latest_version(source)
        _assert_current(spark, source, view)


def test_rebuild_reads_the_watermarked_version(spark, tmp_path, monkeypatch):
    """Review r7: the rebuild fallback must read the EXACT version its
    watermark records — an unpinned read racing a concurrent source
    commit would make the view newer than its watermark and double-fold
    those deltas on the next refresh."""
    import implementing_scds_in_hive_spark.operators.matview as mv

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    write_snapshot(e.where(F.col("event_id") % 2 == 0), source)
    maintain_view(spark, source, view, KEY)
    # retention outruns the view: v2, v3 land and v1..v2 are vacuumed
    write_snapshot(e.where(F.col("event_id") % 3 == 0), source)
    from implementing_scds_in_hive_spark.sources.snapshot import vacuum

    vacuum(source, keep_last=1, grace_seconds=0.0)

    # simulate the race: latest_version says v2 when new_wm is chosen,
    # but v3 commits before the rebuild's read executes
    real_latest = mv.latest_version
    state = {"fired": False}

    def racing_latest(root):
        v = real_latest(root)
        if root == source and not state["fired"]:
            state["fired"] = True
            write_snapshot(e.where(F.col("event_id") % 5 == 0), source)
        return v

    monkeypatch.setattr(mv, "latest_version", racing_latest)
    rep = maintain_view(spark, source, view, KEY)
    monkeypatch.setattr(mv, "latest_version", real_latest)
    assert rep["rebuilt"] and rep["watermark"] == 2
    # the view contains exactly v2's rollup (pinned read), not v3's
    expected_v2 = event_rollup(
        read_table(spark, source) if latest_version(source) == 2
        else __import__("implementing_scds_in_hive_spark.sources.snapshot",
                        fromlist=["read_snapshot"]).read_snapshot(
            spark, source, version=2)
    )
    assert _canon(read_table(spark, view)) == _canon(expected_v2)
    # and the NEXT refresh folds v2 -> v3 exactly once
    maintain_view(spark, source, view, KEY)
    _assert_current(spark, source, view)


def test_concurrent_refreshers_conflict_loudly(spark, tmp_path, monkeypatch):
    """Review r7: the view commit CASes on the view version whose
    content was folded — a second refresher that read the pre-fold view
    raises CommitConflictError instead of folding the same deltas twice
    on top of the winner's result."""
    import implementing_scds_in_hive_spark.operators.matview as mv
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
    )

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    write_snapshot(e.where(F.col("event_id") % 2 == 0), source)
    maintain_view(spark, source, view, KEY)
    write_snapshot(e, source)  # pending deltas both refreshers will see

    real_ws = mv.write_snapshot
    state = {"won": False}

    def interleaved(df, root_, **kw):
        if root_ == view and not state["won"]:
            state["won"] = True
            # the concurrent winner completes its whole refresh first
            mv.maintain_view(spark, source, view, KEY)
        return real_ws(df, root_, **kw)

    monkeypatch.setattr(mv, "write_snapshot", interleaved)
    with pytest.raises(CommitConflictError):
        maintain_view(spark, source, view, KEY)
    monkeypatch.setattr(mv, "write_snapshot", real_ws)
    # winner's fold stands, exactly once applied
    _assert_current(spark, source, view)
    assert maintain_view(spark, source, view, KEY)["updated"] is False


def test_bounded_catchup_to_version(spark, tmp_path):
    """``to_version`` caps one refresh at an older committed version
    (rate-limited catch-up); subsequent refreshes continue from the cap
    and the invariant holds at every step."""
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    write_snapshot(e.where(F.col("event_id") % 4 == 0), source)
    write_snapshot(e.where(F.col("event_id") % 4 <= 1), source)
    write_snapshot(e.where(F.col("event_id") % 4 <= 2), source)

    rep = maintain_view(spark, source, view, KEY, to_version=1)
    assert rep["updated"] and rep["watermark"] == 1
    got = read_table(spark, view)
    expected = event_rollup(
        __import__(
            "implementing_scds_in_hive_spark.sources.snapshot",
            fromlist=["read_snapshot"],
        ).read_snapshot(spark, source, version=1)
    )
    assert _canon(got) == _canon(expected)

    rep = maintain_view(spark, source, view, KEY, to_version=2)
    assert rep["watermark"] == 2
    # a cap at-or-below the watermark is a no-op
    rep = maintain_view(spark, source, view, KEY, to_version=2)
    assert rep["updated"] is False and rep["watermark"] == 2
    # uncapped refresh reaches the head and the view is current
    rep = maintain_view(spark, source, view, KEY)
    assert rep["watermark"] == 3
    _assert_current(spark, source, view)


def test_bounded_catchup_on_vacuumed_cap_raises_clear_error(spark, tmp_path):
    """Self-review r8: when to_version itself names a vacuumed version,
    the rebuild fallback cannot satisfy the cap — it must raise the
    actionable error, not re-raise the internal FileNotFoundError."""
    from implementing_scds_in_hive_spark.sources.snapshot import vacuum

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    e = _events(spark)
    for i in range(3):
        write_snapshot(e.where(F.col("event_id") % 3 >= i), source)
    vacuum(source, keep_last=1, grace_seconds=0.0)

    with pytest.raises(ValueError, match="vacuumed away"):
        maintain_view(spark, source, view, KEY, to_version=1)
    # uncapped: the standard full-rebuild fallback path still works
    rep = maintain_view(spark, source, view, KEY)
    assert rep["updated"] and rep["watermark"] == 3
    _assert_current(spark, source, view)

def test_source_history_reset_fails_loudly(spark, tmp_path):
    """r11 matview review: a source wiped and re-created restarts its
    version history below the view's stored watermark. changes_since
    previously returned a silent no-op — the view would serve rollups
    of a table that no longer exists forever. It must raise instead
    (same loud rule as the streaming maintainers' watermark guards)."""
    import shutil

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    df = _events(spark).limit(300)
    write_snapshot(df, source)
    write_snapshot(df.limit(200), source, mode="append")
    write_snapshot(df.limit(100), source, mode="append")
    maintain_view(spark, source, view, KEY)

    shutil.rmtree(source)
    write_snapshot(df.limit(50), source)  # history restarts at v1
    with pytest.raises(RuntimeError, match="history was reset"):
        maintain_view(spark, source, view, KEY)


def test_maintain_view_link_crash_sweep_converges(spark, tmp_path, monkeypatch):
    """r13 (r14 candidate #5 pulled forward): sweep an injected death
    over EVERY manifest-link call the refreshes perform across a mixed
    source schedule (appends, an overwrite with deletes+updates, a
    multi-version catch-up window) — the manifest-watermark face's
    analog of the changefeed (poll, phase) sweep. After each killed
    refresh is retried (the restart), the view must equal a from-scratch
    rollup of the source and a further refresh must be a no-op (no
    double fold), at EVERY kill position."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap

    e = _events(spark)
    k = F.col("event_id")
    versions = [
        e.where(k % 2 == 0),
        e.where(k % 3 != 0),  # deletes + inserts vs v1
        e.withColumn("value", F.col("value") + 1.0),  # updates everywhere
        e.where(k % 5 != 0),
    ]
    # refresh after v1, then after v2, then after BOTH v3+v4 (catch-up)
    refresh_after = {0, 1, 3}
    real_link = os.link

    def run(kill_at: int, tag: str) -> int:
        source = str(tmp_path / f"src_{tag}")
        view = str(tmp_path / f"view_{tag}")
        counter = {"n": 0}

        def flaky(src, dst):
            counter["n"] += 1
            if counter["n"] == kill_at:
                raise RuntimeError("injected view-commit death")
            return real_link(src, dst)

        def refresh():
            monkeypatch.setattr(snap.os, "link", flaky)
            try:
                try:
                    maintain_view(spark, source, view, KEY,
                                  retain_versions=None)
                except RuntimeError as exc:
                    if "injected" not in str(exc):
                        raise
                    # the restart: same deterministic diff, folded once
                    maintain_view(spark, source, view, KEY,
                                  retain_versions=None)
            finally:
                monkeypatch.setattr(snap.os, "link", real_link)

        for i, v in enumerate(versions):
            write_snapshot(v, source)
            if i in refresh_after:
                refresh()
        _assert_current(spark, source, view)
        rep = maintain_view(spark, source, view, KEY, retain_versions=None)
        assert rep["updated"] is False, f"double-fold window at kill {kill_at}"
        _assert_current(spark, source, view)
        return counter["n"]

    total_links = run(10_000, "base")  # no kill fires: measure the count
    assert total_links >= 3, "schedule performs fewer links than expected"
    for kill_at in range(1, total_links + 1):
        run(kill_at, f"k{kill_at}")


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_maintain_view_crash_sweep_with_retention_vacuum(spark, tmp_path, monkeypatch):
    """r14 (VERDICT r13 next-round #4): the r13 link sweep ran with
    retention OFF, so deaths inside the view's own vacuum — and the
    commit→vacuum window — were never exercised. Re-sweep the same
    mixed schedule with ``retain_versions=2, grace 0`` live, injecting a
    death at EVERY manifest-link (commit) AND unlink (manifest drop /
    vacuum reclaim) the refreshes perform. A death after the commit but
    inside vacuum must leave a refresh that retries as a clean no-op
    (the manifest already carries the watermark — no double fold), and
    the next successful refresh's vacuum re-bounds the history."""
    import shutil as _shutil

    import implementing_scds_in_hive_spark.sources.snapshot as snap

    e = _events(spark)
    k = F.col("event_id")
    versions = [
        e.where(k % 2 == 0),
        e.where(k % 3 != 0),
        e.withColumn("value", F.col("value") + 1.0),
        e.where(k % 5 != 0),
    ]
    refresh_after = {0, 1, 3}
    real_link, real_unlink, real_rmtree = os.link, os.unlink, _shutil.rmtree

    def run(kill_at: int, tag: str) -> int:
        source = str(tmp_path / f"rsrc_{tag}")
        view = str(tmp_path / f"rview_{tag}")
        counter = {"n": 0}

        def tick(op):
            counter["n"] += 1
            if counter["n"] == kill_at:
                raise RuntimeError(f"injected {op} death")

        def flaky_link(src, dst):
            tick("link")
            return real_link(src, dst)

        def flaky_unlink(p, *a, **kw):
            # shutil.rmtree passes dir_fd; forward everything verbatim
            tick("unlink")
            return real_unlink(p, *a, **kw)

        def refresh():
            monkeypatch.setattr(snap.os, "link", flaky_link)
            monkeypatch.setattr(snap.os, "unlink", flaky_unlink)
            try:
                try:
                    maintain_view(spark, source, view, KEY,
                                  retain_versions=2,
                                  retain_grace_seconds=0.0)
                except RuntimeError as exc:
                    if "injected" not in str(exc):
                        raise
                    maintain_view(spark, source, view, KEY,
                                  retain_versions=2,
                                  retain_grace_seconds=0.0)
            finally:
                monkeypatch.setattr(snap.os, "link", real_link)
                monkeypatch.setattr(snap.os, "unlink", real_unlink)

        for i, v in enumerate(versions):
            write_snapshot(v, source)
            if i in refresh_after:
                refresh()
        _assert_current(spark, source, view)
        rep = maintain_view(spark, source, view, KEY,
                            retain_versions=2, retain_grace_seconds=0.0)
        assert rep["updated"] is False, f"double-fold window at kill {kill_at}"
        _assert_current(spark, source, view)
        # a no-op refresh does not vacuum; bound the history explicitly
        # (a death inside an earlier vacuum may have left extra versions)
        from implementing_scds_in_hive_spark.sources.snapshot import (
            list_versions,
            vacuum,
        )
        vacuum(view, keep_last=2, grace_seconds=0.0)
        assert len(list_versions(view)) <= 2
        _assert_current(spark, source, view)
        return counter["n"]

    total_ops = run(10_000_000, "base")  # no kill: count the positions
    assert total_ops >= 6, "schedule performs fewer link/unlink ops than expected"
    for kill_at in range(1, total_ops + 1):
        run(kill_at, f"k{kill_at}")
