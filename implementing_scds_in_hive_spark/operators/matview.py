"""Materialized-view maintenance over snapshot tables (VERDICT r6
next-round #3): poll the commit log's change feed, fold the signed
deltas into a persisted rollup, survive crash-replay.

The two primitives existed separately — ``sources/snapshot.py:
changes_since`` (signed Z-set deltas between committed versions) and
``operators/incremental.py:merge_rollup_signed`` (fold ±1-weighted rows
into a monoid rollup, correct under updates AND deletes). This module
composes them into the feature a user actually wants: a VIEW TABLE that
tracks a SOURCE TABLE incrementally, recomputing O(changed keys) per
refresh instead of rescanning history — the differential-dataflow shape
at commit-log granularity.

Exactly-once without a sidecar state file: the source watermark commits
ATOMICALLY with the view data, inside the view's own manifest
(``write_snapshot(app_meta={"source_watermark": v})`` — the Delta
``txnAppId/txnVersion`` idea). A crash after the view commit loses
nothing (the watermark is in the manifest); a crash before it replays a
deterministic diff of the same two source versions. There is no window
in which deltas could be double-folded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from implementing_scds_in_hive_spark.operators.incremental import (
    event_rollup,
    merge_rollup_signed,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    changes_since,
    is_snapshot_table,
    latest_version,
    list_versions,
    load_manifest,
    read_snapshot,
    read_table,
    vacuum,
    write_snapshot,
)

_WATERMARK = "source_watermark"


def view_watermark(view_root: str) -> int | None:
    """The source version the persisted view is current through (read
    from the view's latest manifest — the atomically-committed state)."""
    if not is_snapshot_table(view_root):
        return None
    v = latest_version(view_root)
    if v is None:
        return None
    return load_manifest(view_root, v).get("app_meta", {}).get(_WATERMARK)


def maintain_view(
    spark: SparkSession,
    source_root: str,
    view_root: str,
    key_cols: list[str],
    *,
    init_fn=None,
    fold_fn=None,
    retain_versions: int | None = 2,
    retain_grace_seconds: float = 600.0,
    to_version: int | None = None,
    **agg_kwargs,
) -> dict:
    """One refresh step of a materialized view: read the view's
    persisted watermark, pull the source's signed deltas since then
    (``changes_since(signed=True)``), fold them into the stored rollup,
    and commit rollup + new watermark in ONE manifest. Idempotent —
    calling again with no new source commits is a no-op; replaying after
    a crash folds the same deterministic diff once.

    ``init_fn(first_load_df)`` builds the view from the initial source
    snapshot (default :func:`event_rollup`); ``fold_fn(existing,
    signed_deltas)`` folds a ±1-weighted delta batch in (default
    :func:`merge_rollup_signed`). Any (init, fold) pair over a
    commutative-monoid aggregate keeps the invariant::

        maintained view == init_fn(current source content)

    (pinned across random publish/append/compact/vacuum chains in
    tests/test_matview.py). ``retain_versions`` bounds the view's own
    commit history the way a per-trigger streaming publisher must
    (vacuum after commit, graced).

    If the source's retention has vacuumed the watermarked version away
    (the "change feed no longer available" case every table format
    has), the refresh falls back to ONE full rebuild from the current
    snapshot and reports ``rebuilt=True`` — correctness never depends
    on retention outpacing the refresh cadence.

    At 100 TB: each refresh costs one full-outer join of two source
    versions (exchange-light when the source is key-clustered) plus a
    rollup-key shuffle of O(changed keys) rows — history is never
    rescanned. Returns ``{"updated", "watermark", "view_version",
    "rebuilt"}``."""
    init_fn = init_fn or (lambda df: event_rollup(df, **agg_kwargs))
    fold_fn = fold_fn or (
        lambda existing, deltas: merge_rollup_signed(
            existing, deltas, **agg_kwargs
        )
    )
    view_v = latest_version(view_root) if is_snapshot_table(view_root) else None
    last = view_watermark(view_root)
    rebuilt = False
    # ``to_version`` bounds the catch-up (changes_since's cap): one call
    # folds at most up to that committed version — the rate-limit knob a
    # scheduler (or a bench isolating per-version refresh cost) needs.
    try:
        batch, new_wm = changes_since(
            spark, source_root, last, key_cols, signed=True,
            to_version=to_version,
        )
    except FileNotFoundError:
        # the source vacuumed past our watermark (retention outran the
        # view — Delta's "change data feed no longer available" case):
        # the incremental diff is impossible, so fall back to a full
        # rebuild from the current snapshot. Correctness is preserved;
        # only this one refresh pays a rescan.
        new_wm = latest_version(source_root)
        if to_version is not None and new_wm is not None:
            new_wm = min(new_wm, to_version)
            if new_wm not in list_versions(source_root):
                # the cap itself names a vacuumed version: a bounded
                # rebuild is impossible and retrying read_snapshot would
                # just re-raise the error we are handling — fail with
                # the actionable message instead
                raise ValueError(
                    f"to_version={to_version} has been vacuumed away at "
                    f"{source_root}; drop the cap to rebuild from the "
                    f"current snapshot"
                ) from None
        batch, rebuilt = None, True
    if batch is None and not rebuilt:
        return {
            "updated": False,
            "watermark": last,
            "view_version": view_v,
            "rebuilt": False,  # full documented contract (r11 review)
        }
    if last is None or rebuilt:
        # the rebuild MUST read the exact version the watermark records:
        # an unpinned read_table could resolve a source commit that
        # landed after new_wm was chosen, making the view newer than
        # its watermark and double-folding those deltas next refresh
        src = batch.drop("__w") if batch is not None else read_snapshot(
            spark, source_root, version=new_wm
        )
        view = init_fn(src)
    else:
        view = fold_fn(read_table(spark, view_root), batch)
    # CAS on the view version whose content was folded: two concurrent
    # refreshers would otherwise both fold the same delta batch (the
    # second one on top of the first's already-folded result). The
    # loser raises CommitConflictError — re-run; the winner's commit
    # already advanced the watermark, so the retry is a cheap no-op.
    v = write_snapshot(
        view,
        view_root,
        app_meta={_WATERMARK: new_wm},
        expected_version=view_v if view_v is not None else 0,
    )
    if retain_versions is not None:
        vacuum(
            view_root,
            keep_last=retain_versions,
            grace_seconds=retain_grace_seconds,
        )
    return {
        "updated": True,
        "watermark": new_wm,
        "view_version": v,
        "rebuilt": rebuilt,
    }


def refresh_until_current(
    spark: SparkSession,
    source_root: str,
    view_root: str,
    key_cols: list[str],
    **kwargs,
) -> dict:
    """Drive :func:`maintain_view` until the view's watermark reaches
    the source's latest committed version (normally one step — the diff
    spans all pending versions at once; loops only if the source commits
    concurrently between steps)."""
    out = maintain_view(spark, source_root, view_root, key_cols, **kwargs)
    while out["updated"] and (
        latest_version(source_root) or 0
    ) > (out["watermark"] or 0):
        out = maintain_view(spark, source_root, view_root, key_cols, **kwargs)
    return out
