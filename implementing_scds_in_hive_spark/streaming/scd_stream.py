"""Structured Streaming face of the SCD2 merge (SURVEY §2.7, §7 Phase E).

The reference is batch-only: "late data" is simply the next staging
snapshot (/root/reference/SCD_script.txt runs on demand). The natural
Spark extension is a micro-batch upsert: each arriving staging batch is
deduped to one row per business key and merged into the dimension table
with the same single-pass plan as the batch operator, then atomically
published. State (the dimension table itself) lives in the table, not in
Spark's state store — which is exactly how Delta's streaming MERGE
pattern works and keeps the stream restartable from the table alone.

At scale: each micro-batch is one broadcast-plan merge (production never
shuffles — see operators/scd.py). :func:`scd2_upsert_stream` publishes a
full rewrite per trigger (fine for small dimensions);
:func:`scd2_cow_upsert_stream` is the 100 TB variant — the file-granular
copy-on-write merge (``scd2_merge_cow``) rewrites only the files a
batch's keys touch, the engine's own Delta-MERGE equivalent.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from implementing_scds_in_hive_spark.operators.cdc import cdc_apply
from implementing_scds_in_hive_spark.sources.snapshot import read_table
from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    dedupe_staging,
    publish,
    scd2_merge,
)


def scd2_upsert_stream(
    staging_stream: DataFrame,
    prod_path: str,
    cfg: SCDConfig,
    *,
    checkpoint_dir: str,
    order_by: list[str] | None = None,
    dedupe_strategy: str = "row_number",
    as_of_fn: Callable[[int], datetime] | None = None,
    trigger_available_now: bool = True,
    crash_hook: Callable[[int, str], None] | None = None,
) -> StreamingQuery:
    """Continuously upsert a staging stream into the dimension at
    ``prod_path``.

    ``order_by``: columns ranking duplicate keys within one batch (last
    wins), e.g. an event timestamp. ``dedupe_strategy="max_by"`` routes
    the per-batch dedupe through the skew-immune map-side aggregation
    (operators/scd.py:dedupe_staging) — the right choice for CDC feeds
    where one hot entity can be redelivered millions of times per
    trigger; row-identical to the default under a total ``order_by``. ``as_of_fn(batch_id)`` supplies the
    merge instant per micro-batch — injectable for deterministic tests,
    defaulting to wall clock (one instant per batch, never per row:
    the reference's per-statement timestamp drift is not reproduced).

    ``crash_hook(batch_id, phase)`` is a fault-injection point for
    crash-recovery testing (phases: ``"pre_publish"`` before any work,
    ``"post_publish"`` after the table swap but BEFORE the checkpoint
    commits the batch): a hook that raises aborts the stream exactly
    where a real process death would. The post-publish window is the
    at-least-once replay case — on restart the same batch_id re-runs
    against the already-updated table, which the merge absorbs because
    ``as_of_fn`` is deterministic per batch and a staging batch equal to
    the active rows produces zero changes (replay idempotence; pinned by
    the hypothesis chains in tests/test_streaming_cdc.py)."""
    spark = staging_stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre_publish")
        as_of = as_of_fn(batch_id) if as_of_fn else datetime.now(timezone.utc).replace(tzinfo=None)
        prod = read_table(spark, prod_path)
        staged = dedupe_staging(
            batch, cfg, order_by=order_by, strategy=dedupe_strategy
        )
        merged = scd2_merge(prod, staged, cfg, as_of, broadcast_staging=True)
        # foreachBatch materializes eagerly, so the lazy-read-overwrite
        # trap applies: publish() commits via the manifest snapshot
        # protocol (immutable staged files + atomic manifest link), so
        # the plan reading prod_path never has its files overwritten.
        publish(merged, prod_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        staging_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_stream(
    changes_stream: DataFrame,
    prod_path: str,
    cfg: SCDConfig,
    *,
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "op_seq",
    as_of_fn: Callable[[int], datetime] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously apply a CDC operation stream (Debezium/binlog-style
    I/U/D rows) to the dimension at ``prod_path`` — the streaming face
    of ``operators/cdc.py:cdc_apply``, with the same table-as-state
    restart story as the snapshot upsert: each micro-batch collapses
    last-wins on ``seq_col``, closes out deletes, resurrects
    re-inserted keys, and atomically publishes. History granularity is
    the micro-batch (intermediate ops within one trigger collapse
    away), matching the batch operator's documented contract —
    stream-vs-batch parity over any split of the feed is therefore
    exact as long as batch boundaries respect ``seq_col`` order, and is
    pinned by tests/test_streaming_cdc.py."""
    spark = changes_stream.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        as_of = as_of_fn(batch_id) if as_of_fn else datetime.now(timezone.utc).replace(tzinfo=None)
        prod = read_table(spark, prod_path)
        # cdc_apply persists the collapsed feed (and two_pass its
        # re-key intermediates); collect the handles and unpersist
        # exactly those once published — a long-running stream would
        # otherwise accumulate cached blocks every trigger, and a
        # blanket clearCache would unpersist every cached DataFrame in
        # the CALLER's session, not just ours (r11 streaming review:
        # nothing enforces that the stream owns the session)
        handles: list[DataFrame] = []
        nxt = cdc_apply(
            prod,
            batch,
            cfg,
            as_of,
            op_col=op_col,
            seq_col=seq_col,
            cache_handles=handles,
        )
        publish(nxt, prod_path, retain_versions=2)
        for h in handles:
            h.unpersist()

    writer = (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_cow_upsert_stream(
    staging_stream: DataFrame,
    prod_root: str,
    cfg: SCDConfig,
    *,
    checkpoint_dir: str,
    order_by: list[str] | None = None,
    as_of_fn: Callable[[int], datetime] | None = None,
    key_strategy: str = "hash",
    retain_versions: int | None = 2,
    retain_grace_seconds: float = 600.0,
    vacuum_every: int = 1,
    max_commit_retries: int = 3,
    trigger_available_now: bool = True,
    crash_hook: Callable[[int, str], None] | None = None,
) -> StreamingQuery:
    """The 100 TB face of :func:`scd2_upsert_stream`: each micro-batch
    merges through the FILE-GRANULAR copy-on-write path
    (``operators/scd.py:scd2_merge_cow``) instead of rewriting the whole
    dimension per trigger — per-trigger write volume is O(touched files
    + inserts), which is what makes a continuously-upserted large
    dimension affordable (the full-rewrite stream pays table-size write
    amplification on EVERY trigger).

    Preconditions: the dimension must already be published as a snapshot
    table (ideally key-clustered with ``stats_cols`` on the business key
    so the file prune bites), and ``key_strategy`` must be stable
    (``hash``/``md5``) — enforced by the merge itself. A lost CAS race
    against a concurrent writer retries up to ``max_commit_retries``
    times (each retry re-reads the new latest version and re-merges —
    safe because the merge is a pure function of current state +
    batch). Replaying a batch after a crash rewrites the same touched
    files with identical content (stable keys + deterministic
    ``as_of_fn``), the same idempotent-upsert recovery class as the
    full-rewrite stream; ``retain_versions`` bounds the commit history
    per the usual per-trigger retention discipline, and
    ``vacuum_every=N`` thins the O(manifest) retention vacuum to every
    Nth batch (skipped vacuums just leave extra retained versions for
    the next one — content-preserving either way)."""
    from implementing_scds_in_hive_spark.operators.scd import scd2_merge_cow

    return _incremental_upsert_stream(
        scd2_merge_cow,
        staging_stream,
        prod_root,
        cfg,
        checkpoint_dir=checkpoint_dir,
        order_by=order_by,
        as_of_fn=as_of_fn,
        key_strategy=key_strategy,
        retain_versions=retain_versions,
        retain_grace_seconds=retain_grace_seconds,
        vacuum_every=vacuum_every,
        max_commit_retries=max_commit_retries,
        trigger_available_now=trigger_available_now,
        crash_hook=crash_hook,
    )


def scd2_mor_upsert_stream(
    staging_stream: DataFrame,
    prod_root: str,
    cfg: SCDConfig,
    *,
    checkpoint_dir: str,
    order_by: list[str] | None = None,
    as_of_fn: Callable[[int], datetime] | None = None,
    key_strategy: str = "hash",
    retain_versions: int | None = 2,
    retain_grace_seconds: float = 600.0,
    vacuum_every: int = 1,
    max_commit_retries: int = 3,
    fold_every: int | None = None,
    trigger_available_now: bool = True,
    crash_hook: Callable[[int, str], None] | None = None,
) -> StreamingQuery:
    """The KEY-SCATTERED face of :func:`scd2_cow_upsert_stream`: each
    micro-batch merges through the merge-on-read deletion-vector path
    (``operators/scd.py:scd2_merge_mor``), so per-trigger write volume
    is O(batch) no matter how the batch's keys scatter — the shape where
    the CoW stream degrades to rewriting most of the table per trigger.

    Tombstone vectors accumulate across triggers (the read overlay's
    broadcast grows with them); ``fold_every=N`` runs
    ``sinks.compact_deletes`` after every Nth batch to fold vectors back
    into clean clustered files inline (a fold losing a CAS race is
    skipped, not retried — it is content-preserving and the next
    scheduled fold catches up). Leave ``None`` when an external
    maintenance job owns the compaction cadence.

    Same restart story as the CoW stream: replaying a batch after a
    crash re-merges against the already-updated table — the staged
    values equal the active rows, so the replay re-tombstones and
    rewrites IDENTICAL row content (content-level idempotence; the
    churned vectors fold away at the next compaction). Same stable-key
    precondition and CAS-retry discipline."""
    from implementing_scds_in_hive_spark.operators.scd import scd2_merge_mor
    from implementing_scds_in_hive_spark.sources.sinks import compact_deletes
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
    )

    def maybe_fold(spark, batch_id: int) -> None:
        if fold_every and (batch_id + 1) % fold_every == 0:
            try:
                compact_deletes(spark, prod_root)
            except CommitConflictError:
                pass  # content-preserving; next scheduled fold catches up

    return _incremental_upsert_stream(
        scd2_merge_mor,
        staging_stream,
        prod_root,
        cfg,
        checkpoint_dir=checkpoint_dir,
        order_by=order_by,
        as_of_fn=as_of_fn,
        key_strategy=key_strategy,
        retain_versions=retain_versions,
        retain_grace_seconds=retain_grace_seconds,
        vacuum_every=vacuum_every,
        max_commit_retries=max_commit_retries,
        trigger_available_now=trigger_available_now,
        crash_hook=crash_hook,
        post_commit=maybe_fold,
    )


def _incremental_upsert_stream(
    merge_fn,
    staging_stream: DataFrame,
    prod_root: str,
    cfg: SCDConfig,
    *,
    checkpoint_dir: str,
    order_by: list[str] | None,
    as_of_fn: Callable[[int], datetime] | None,
    key_strategy: str,
    retain_versions: int | None,
    retain_grace_seconds: float,
    vacuum_every: int,
    max_commit_retries: int,
    trigger_available_now: bool,
    crash_hook: Callable[[int, str], None] | None,
    post_commit=None,
) -> StreamingQuery:
    """Shared trigger loop for the incremental (CoW / MoR) upsert
    streams: dedupe the batch, run ``merge_fn`` with CAS retries (each
    retry re-reads the new latest version and re-merges — safe because
    the merge is a pure function of current state + batch), then the
    per-trigger retention vacuum and the optional ``post_commit`` hook.
    """
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
        vacuum,
    )

    if max_commit_retries < 1:
        # zero/negative would skip the retry loop body: the merge never
        # runs yet the checkpoint commits the batch — silent data loss
        raise ValueError(
            f"max_commit_retries must be >= 1 (one attempt), got "
            f"{max_commit_retries}"
        )
    spark = staging_stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre_publish")
        as_of = (
            as_of_fn(batch_id)
            if as_of_fn
            else datetime.now(timezone.utc).replace(tzinfo=None)
        )
        staged = dedupe_staging(batch, cfg, order_by=order_by)
        for attempt in range(max_commit_retries):
            try:
                merge_fn(
                    spark, prod_root, staged, cfg, as_of,
                    key_strategy=key_strategy,
                )
                break
            except CommitConflictError:
                if attempt == max_commit_retries - 1:
                    raise
        if retain_versions is not None and (
            vacuum_every <= 1 or (batch_id + 1) % vacuum_every == 0
        ):
            vacuum(
                prod_root,
                keep_last=retain_versions,
                grace_seconds=retain_grace_seconds,
            )
        if post_commit:
            post_commit(spark, batch_id)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        staging_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
