"""Streaming near-dup detection against the durable MinHash index.

The production shape of corpus dedup at 100 TB: the corpus index is
built ONCE (``operators/index_store.py:save_minhash_index``) and then
kept current by the ingest stream itself — each micro-batch of new
documents is probed against the stored index (cross-corpus pairs),
against itself (intra-batch pairs), and finally folded INTO the index,
so the next batch dedups against everything that came before. State
lives in the index tables, not Spark's state store — the same
table-as-state restart story as ``scd_stream.py``: the checkpoint
replays an uncommitted batch, the pair sink is overwritten per batch id
(idempotent), and re-appending is guarded by an anti-join on ``did``.

Per-trigger cost is O(batch + touched buckets) — the incremental-probe
contract — independent of corpus size; the index grows by one file per
touched bucket per batch (compact on your maintenance cadence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from implementing_scds_in_hive_spark.operators.dedup import (
    _verify_candidates,
    portable_minhash_index,
)
from implementing_scds_in_hive_spark.operators.index_store import (
    append_minhash_index,
    incremental_minhash_pairs_stored,
    load_minhash_index,
    maintain_index,
)


def minhash_dedup_stream(
    doc_stream: DataFrame,
    index_root: str,
    pairs_path: str,
    *,
    checkpoint_dir: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    append_to_index: bool = True,
    maintain_every: int = 0,
    maintain_max_files_per_bucket: float = 8.0,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Probe each micro-batch of documents against the saved corpus
    index at ``index_root`` and (optionally) fold the batch in.

    Emits to ``pairs_path`` (parquet, partitioned by ``batch_id``) one
    row per near-dup pair: (batch_id, id_a, id_b, jaccard) — id_a a
    prior-corpus doc for cross pairs, the lower batch doc id for
    intra-batch pairs. Batch replay after a crash overwrites its own
    ``batch_id`` partition, excludes its own already-appended ids from
    the corpus side, and skips re-appending them — restart-idempotent
    end to end (same output as the crash-free run).

    The index build params (``n``/``num_perm``/``bands``) must match the
    sidecar's — they are validated against it when present.

    ``maintain_every=N`` runs :func:`operators.index_store.maintain_index`
    after every Nth batch's append (0 = caller owns maintenance): crash
    orphans are swept and the bucketed tables are compacted once append
    growth crosses ``maintain_max_files_per_bucket`` — the automation
    that keeps a months-long ingest's probe cost flat instead of
    degrading one file-per-bucket-per-batch at a time. Maintenance is
    idempotent and content-preserving, so a replayed batch that re-runs
    it (or crashes inside it — compaction itself is stage-then-commit)
    leaves the same index the crash-free run would.

    ``crash_hook(batch_id, phase)`` is the same fault-injection contract
    as ``scd_stream.py``: phases ``"pre"`` (no work yet),
    ``"post_pairs"`` (pairs published, index NOT yet appended — the
    dangerous window: a replay must re-probe identically and still
    append exactly once) and ``"post_append"`` (all effects done —
    including maintenance, which runs before this hook — checkpoint not
    yet committed). Raising aborts where a process death would; recovery
    is pinned by tests/test_dedup_stream.py."""
    spark = doc_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        docs = batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        # ONE index load per trigger, reused by the params check, the
        # cross-probe and the append replay guard (was three meta reads
        # + three bucketed-table registrations — r11 streaming review)
        idx = load_minhash_index(spark, index_root)
        params = idx[2]
        for k, v in (("n", n), ("num_perm", num_perm), ("bands", bands)):
            if k in params and params[k] != v:
                raise ValueError(
                    f"index at {index_root} was built with {k}={params[k]}, stream uses {v}"
                )
        bidx = portable_minhash_index(
            docs, n=n, num_perm=num_perm, bands=bands
        ).localCheckpoint(eager=True)

        # corpus × batch pairs; on a post-append replay the index
        # already holds this batch's ids — exclude them so the replayed
        # partition is byte-identical to the crash-free run
        cross = incremental_minhash_pairs_stored(
            spark, index_root, bidx, threshold=threshold, index=idx
        ).join(
            bidx.select(F.col("did").alias("id_a")), "id_a", "left_anti"
        )
        # intra-batch pairs from the same checkpointed batch index (no
        # extra persist): burst buckets, shared candidate/verify path
        banded = bidx.select("did", F.explode("bb").alias("bb")).select(
            "did", "bb.band", "bb.bucket"
        )
        intra = _verify_candidates(bidx.select("did", "sh"), banded, threshold)
        pairs = cross.unionByName(intra).withColumn("batch_id", F.lit(batch_id))
        # dynamic partition overwrite: a replayed batch rewrites ONLY its
        # own partition — the idempotence half of the restart story
        (
            pairs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )
        if crash_hook:
            crash_hook(batch_id, "post_pairs")

        if append_to_index:
            # replay guard: never re-append ids the index already holds
            # (no append has run since the top-of-trigger load, so the
            # loaded docs frame is current)
            existing = idx[0].select("did")
            fresh = bidx.join(existing, "did", "left_anti")
            if not fresh.isEmpty():
                append_minhash_index(spark, index_root, fresh)
            if maintain_every and batch_id % maintain_every == maintain_every - 1:
                maintain_index(
                    spark,
                    index_root,
                    max_files_per_bucket=maintain_max_files_per_bucket,
                )
        if crash_hook:
            crash_hook(batch_id, "post_append")

    writer = (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def substring_dedup_stream(
    doc_stream: DataFrame,
    index_root: str,
    spans_path: str,
    *,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    append_to_index: bool = True,
    maintain_every: int = 0,
    maintain_max_files_per_bucket: float = 8.0,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Streaming EXACT-SUBSTRING duplication against the durable winnow
    index (r14 — the :func:`minhash_dedup_stream` shape for the Lee et
    al. tier): each micro-batch is probed for cross-corpus shared runs
    (``incremental_exact_substring_spans_stored``), for intra-batch runs
    (the batch operator on the batch alone), and then folded into the
    index, so a later batch's copy of an earlier batch's passage is
    caught through the index alone. State lives in the index tables —
    the table-as-state restart story: per-batch dynamic partition
    overwrite of the spans sink, an anti-join append guard, and
    cross-probe exclusion of the batch's own already-appended ids make
    replays byte-identical.

    The span parameters (min_len, k) come from the INDEX SIDECAR — the
    stream has no override knobs, because fingerprints built with
    different parameters never match correctly; a mismatched index
    raises at the first trigger.

    Emits (batch_id, id_a, id_b, start_a, start_b, span_len): ``id_a``
    a prior-corpus doc for cross spans, the lower batch id for intra
    spans. ``crash_hook(batch_id, phase)`` phases: ``"pre"``,
    ``"post_spans"`` (sink written, index not yet appended — the replay
    window), ``"post_append"``."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        exact_substring_spans,
        winnow_span_index,
    )
    from implementing_scds_in_hive_spark.operators.index_store import (
        append_winnow_index,
        incremental_exact_substring_spans_stored,
        load_winnow_index,
    )

    spark = doc_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        docs = batch.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        idx = load_winnow_index(spark, index_root)
        params = idx[2]
        min_len, k = params.get("min_len"), params.get("k")
        if min_len is None or k is None:
            raise ValueError(
                f"winnow index at {index_root} lacks (min_len, k) params"
            )
        bidx = winnow_span_index(
            docs, min_len=min_len, k=k
        ).localCheckpoint(eager=True)

        cross = incremental_exact_substring_spans_stored(
            spark, index_root, bidx, index=idx
        ).join(bidx.select(F.col("did").alias("id_a")), "id_a", "left_anti")
        intra = exact_substring_spans(docs, min_len=min_len, k=k)
        spans = cross.unionByName(intra).withColumn("batch_id", F.lit(batch_id))
        (
            spans.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(spans_path)
        )
        if crash_hook:
            crash_hook(batch_id, "post_spans")

        if append_to_index:
            existing = idx[0].select("did")
            fresh = bidx.join(existing, "did", "left_anti")
            if not fresh.isEmpty():
                append_winnow_index(spark, index_root, fresh)
            if maintain_every and batch_id % maintain_every == maintain_every - 1:
                maintain_index(
                    spark,
                    index_root,
                    max_files_per_bucket=maintain_max_files_per_bucket,
                )
        if crash_hook:
            crash_hook(batch_id, "post_append")

    writer = (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
