"""Continuous subscription to a snapshot table's commit log (VERDICT r6
next-round #8): the streaming face of ``sources/snapshot.py:
changes_since``, so a downstream pipeline can subscribe to a snapshot
table the way it subscribes to a stream.

Spark has no native source for the manifest log, so the subscription is
a ticker-driven poll — the standard shape for log-backed custom sources:
a ``rate`` micro-batch stream provides the trigger cadence, and each
tick polls the commit log, applies any new versions' deltas, then
advances a persisted watermark. The watermark write is atomic
(temp + ``os.replace``) and happens AFTER the apply, so every crash
point lands in one of the catalogued recovery classes:

* crash before apply — nothing happened; the next tick re-polls.
* crash after apply, before the watermark write — the next tick replays
  the SAME deterministic diff (``(from, to)`` pair), so ``apply_fn``
  must be idempotent per ``(from_version, to_version)`` — e.g. dynamic
  partition overwrite keyed by ``to_version`` (the idempotent-upsert
  class every sink in ``streaming/`` already uses).
* crash after the watermark write — the batch is complete; the next
  tick sees nothing new.

If the source's retention vacuums past the subscriber's watermark (the
"change feed no longer available" case), the poll raises with a
re-bootstrap instruction instead of silently skipping versions —
deltas, unlike the materialized view's fold (``operators/matview.py``),
cannot be reconstructed from the current snapshot alone.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from implementing_scds_in_hive_spark.sources.snapshot import changes_since

_STATE_FILE = "watermark.json"


def read_watermark(state_dir: str) -> int | None:
    try:
        with open(os.path.join(state_dir, _STATE_FILE)) as f:
            return json.load(f)["watermark"]
    except FileNotFoundError:
        return None


def _write_watermark_atomic(state_dir: str, version: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f".{_STATE_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump({"watermark": version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_dir, _STATE_FILE))


def poll_changes_once(
    spark: SparkSession,
    source_root: str,
    key_cols: list[str],
    apply_fn,
    *,
    state_dir: str,
    signed: bool = False,
    crash_hook=None,
    batch_id: int = 0,
) -> dict:
    """One poll of the commit log: deltas since the persisted watermark
    are handed to ``apply_fn(changes_df, from_version, to_version)``
    (``from_version`` is None for the initial load), then the watermark
    advances atomically. This is the batch face the streaming ticker
    drives; it is also directly usable from a cron-style scheduler.
    Returns ``{"applied", "from", "to"}``."""
    last = read_watermark(state_dir)
    try:
        batch, new_wm = changes_since(
            spark, source_root, last, key_cols, signed=signed
        )
    except FileNotFoundError as e:
        raise RuntimeError(
            f"source retention vacuumed past subscriber watermark {last} "
            f"at {source_root}; deltas are unrecoverable — clear "
            f"{state_dir} to re-bootstrap from the current snapshot"
        ) from e
    if batch is None:
        return {"applied": False, "from": last, "to": last}
    if crash_hook:
        crash_hook(batch_id, "pre_apply")
    apply_fn(batch, last, new_wm)
    if crash_hook:
        crash_hook(batch_id, "post_apply")
    _write_watermark_atomic(state_dir, new_wm)
    if crash_hook:
        crash_hook(batch_id, "post_watermark")
    return {"applied": True, "from": last, "to": new_wm}


def follow_changes_stream(
    spark: SparkSession,
    source_root: str,
    key_cols: list[str],
    apply_fn,
    *,
    state_dir: str,
    checkpoint_dir: str,
    signed: bool = False,
    poll_interval: str = "1 seconds",
    crash_hook=None,
) -> StreamingQuery:
    """Subscribe continuously: a ``rate`` ticker triggers
    :func:`poll_changes_once` every ``poll_interval``. The rate rows are
    only a clock — all real state is the source's commit log plus the
    atomic watermark file, so killing the query and restarting it (even
    with a fresh checkpoint) resumes exactly where the watermark says.
    """
    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def on_tick(_batch, batch_id: int) -> None:
        poll_changes_once(
            spark,
            source_root,
            key_cols,
            apply_fn,
            state_dir=state_dir,
            signed=signed,
            crash_hook=crash_hook,
            batch_id=batch_id,
        )

    return (
        ticks.writeStream.foreachBatch(on_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=poll_interval)
        .start()
    )


def follow_view_stream(
    spark: SparkSession,
    source_root: str,
    view_root: str,
    key_cols: list[str],
    *,
    checkpoint_dir: str,
    poll_interval: str = "1 seconds",
    **maintain_kwargs,
) -> StreamingQuery:
    """Continuous materialized-view maintenance (VERDICT r7 next-round
    #8): the change-feed subscriber and the view fold are two faces of
    the same commit log, composed — a ``rate`` ticker drives
    ``operators/matview.py:maintain_view`` every ``poll_interval``, so
    the view TRACKS a live source across concurrent commits instead of
    waiting for a scheduler.

    Unlike :func:`follow_changes_stream`, there is NO sidecar watermark
    file: all real state is the view's own manifest (the source
    watermark commits atomically with the folded data via ``app_meta``),
    so killing the query and restarting it — even with a fresh
    checkpoint — resumes exactly where the view's manifest says, and
    every crash point lands in ``maintain_view``'s existing recovery
    classes (replay folds the same deterministic diff once). A
    concurrent refresher losing the view CAS is tolerated per tick: the
    winner's commit already advanced the watermark, so the next tick
    sees nothing new. ``maintain_kwargs`` pass through to
    ``maintain_view`` (init/fold functions, retention, agg config)."""
    from implementing_scds_in_hive_spark.operators.matview import (
        maintain_view,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
    )

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def on_tick(_batch, _batch_id: int) -> None:
        try:
            maintain_view(
                spark, source_root, view_root, key_cols, **maintain_kwargs
            )
        except CommitConflictError:
            pass  # concurrent refresher won; its commit carries the state

    return (
        ticks.writeStream.foreachBatch(on_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=poll_interval)
        .start()
    )
