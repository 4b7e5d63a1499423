"""Streaming maintenance of a KMV distinct-count sketch table.

The operational answer to "distinct users per day, live, at 100 TB":
exact streaming COUNT(DISTINCT) needs unbounded state (every seen key);
this keeps ONE k-hash sketch row per group, folded forward by the
ingest stream. Each micro-batch is sketched (bounded work in the batch
size) and merged into the stored table via ``kmv_merge`` — and because
merge is bottom-k of a hash-set union, it is IDEMPOTENT and
ASSOCIATIVE: replaying an uncommitted batch after a crash re-merges
hashes the table already contains and changes nothing, so the
table-as-state restart story needs no replay guard at all (contrast
``dedup_stream.py``'s anti-join guard — here the algebra is the
guard; pinned by tests/test_sketch_stream.py's crash chain).

End state equals the batch computation exactly: stream-maintained
sketch == ``kmv_sketch`` over all events in one pass (same arrays, not
just similar estimates) — the merge property, verified per run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from implementing_scds_in_hive_spark.operators.scd import publish
from implementing_scds_in_hive_spark.sources.snapshot import latest_version, read_table
from implementing_scds_in_hive_spark.operators.sketches import kmv_merge, kmv_sketch


def _load_state(spark, path: str) -> DataFrame | None:
    """Read a stream's state table, distinguishing "no table yet"
    (first batch: None) from a transient read failure (re-raised). A
    bare ``except`` here would treat one manifest/filesystem hiccup on
    a months-old table as "first batch" and let the subsequent publish
    overwrite ALL accumulated state with a single batch's data
    (r11 streaming review)."""
    if latest_version(path) is None:
        return None
    return read_table(spark, path)


def _is_replay(batch_id: int, watermark, path: str) -> bool:
    """True = this batch is a post-publish crash REPLAY (batch_id ==
    stored watermark: its effects are already in the table — skip
    wholesale). A batch id strictly BELOW the watermark is NOT a
    replay: it means the checkpoint was reset/recreated while the
    state table kept its history, and skipping would silently drop
    every batch until the fresh ids catch up (r11 streaming review) —
    fail loudly instead."""
    if watermark is None:
        return False
    if batch_id < watermark:
        raise RuntimeError(
            f"stream batch id {batch_id} regressed below the stored "
            f"high-watermark {watermark} at {path}: the checkpoint was "
            f"reset while the state table kept its history. Restore "
            f"the original checkpoint, or start a fresh state path for "
            f"the new checkpoint epoch."
        )
    return batch_id == watermark


def kmv_sketch_stream(
    events: DataFrame,
    sketch_path: str,
    *,
    checkpoint_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    portable: bool = False,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Maintain a per-group KMV sketch table at ``sketch_path`` from a
    stream. Output table schema: ``group_cols..., kmv array<bigint>`` —
    feed it to ``kmv_estimate`` / ``kmv_merge`` / ``kmv_jaccard`` for
    live distinct counts, rolling windows, or overlap estimates.

    ``crash_hook(batch_id, phase)`` fault injection, phases ``"pre"``
    and ``"post_publish"`` (sketch written, checkpoint not committed —
    the replay window where idempotent merge carries recovery)."""
    g = list(group_cols)
    spark = events.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        delta = kmv_sketch(batch, g, value_col, k=k, portable=portable)
        existing = _load_state(spark, sketch_path)
        merged = (
            kmv_merge(existing, delta, g, k=k)
            if existing is not None
            else delta
        )
        # localCheckpoint before publish: `merged` lazily READS
        # sketch_path, which publish is about to replace — the same
        # self-overwrite trap publish() documents for the SCD dimension
        out = merged.localCheckpoint(eager=True)
        publish(out, sketch_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def histogram_stream(
    events: DataFrame,
    hist_path: str,
    *,
    checkpoint_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    num_bins: int = 1000,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Maintain a per-group binned histogram table from a stream — the
    ADDITIVE counterpart of :func:`kmv_sketch_stream`, and the
    instructive contrast in the table-as-state taxonomy: histogram
    merge is a SUM, and sums are NOT idempotent. A replayed batch would
    double-count, so this stream carries the guard KMV does not need —
    a batch-id high-watermark column stored in the table itself; a
    replay (batch_id <= watermark) is skipped wholesale. The three
    streaming-state recovery modes in this repo:

    * table-as-state upsert (scd_stream): replay-idempotent via
      anti-join / dynamic partition overwrite;
    * algebra-idempotent state (kmv_sketch_stream): merge absorbs
      replays, no guard at all;
    * additive state (here): watermark guard, because the algebra
      cannot absorb a replay.

    Output table: ``group_cols..., bucket int, cnt bigint,
    last_batch_id bigint`` — feed the first three columns to
    ``percentiles_from_histogram`` for live quantiles."""
    from implementing_scds_in_hive_spark.operators.sketches import binned_histogram

    g = list(group_cols)
    spark = events.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        existing = _load_state(spark, hist_path)
        watermark = (
            existing.agg(F.max("last_batch_id")).collect()[0][0]
            if existing is not None
            else None
        )
        if _is_replay(batch_id, watermark, hist_path):
            # post-publish crash replay: the counts are already in the
            # table — adding again would double-count; skip wholesale
            return
        delta = binned_histogram(batch, g, value_col, lo=lo, hi=hi, num_bins=num_bins)
        if existing is not None:
            merged = (
                existing.select(*g, "bucket", "cnt")
                .unionByName(delta)
                .groupBy(*g, "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        out = merged.withColumn("last_batch_id", F.lit(batch_id)).localCheckpoint(
            eager=True
        )
        publish(out, hist_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bloom_seen_stream(
    events: DataFrame,
    bloom_path: str,
    out_path: str,
    *,
    checkpoint_dir: str,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """First-seen / repeat classification of a key stream against a
    durable Bloom filter — bounded-memory ingest dedup: "have we EVER
    seen this id" over an unbounded key history costs ``num_bits`` of
    state, not one entry per key.

    Per batch: probe each row against the stored filter
    (``seen_before`` — NO false negatives, so ``seen_before = false``
    is guaranteed-first-delivery; ``true`` is wrong at ~FPR, the
    documented Bloom asymmetry), write the classified batch to
    ``out_path`` partitioned by batch id (dynamic-overwrite idempotent,
    the scd_stream discipline), then OR-fold the batch's keys into the
    filter. Bit-OR is idempotent — a post-publish crash replay re-ORs
    bits already set and converges, the kmv_sketch_stream recovery
    class — but the OUTPUT is not replay-invariant for free: a replayed
    batch re-probes with its own bits possibly already folded in, which
    would flip its rows to seen_before=true. The per-batch probe
    therefore excludes nothing from the filter but rewrites its own
    output partition from the ORIGINAL pre-batch filter, which is
    reconstructible because the filter table is versioned by batch id
    (the row with the highest ``batch_id`` <= current-1 is the probe
    basis). Filter versions are tiny (sparse word maps), pruned to the
    latest two."""
    from implementing_scds_in_hive_spark.operators.bloom import (
        bloom_collect,
        bloom_might_contain,
    )

    spark = events.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        versions = _load_state(spark, bloom_path)
        basis = None
        if versions is not None:
            heads = versions.orderBy(F.col("batch_id").desc()).limit(1).collect()
            # a state table that exists but holds ZERO rows (retention /
            # vacuum edge, or a manually truncated table) must fall
            # through to the first-batch path, not IndexError (r11
            # ADVICE) — so guard the head row.
            head = heads[0] if heads else None
        else:
            head = None
        if head is not None:
            # a batch id below the newest stored version means the
            # checkpoint was reset while the filter kept its history:
            # proceeding would classify every repeat as first-seen AND
            # fold a from-scratch filter over the accumulated one,
            # silently destroying the key history (r11 streaming
            # review). head == batch_id is the normal post-publish
            # crash replay (re-OR of set bits, idempotent).
            if head["batch_id"] > batch_id:
                raise RuntimeError(
                    f"stream batch id {batch_id} regressed below the "
                    f"newest stored filter version "
                    f"{head['batch_id']} at {bloom_path}: the "
                    f"checkpoint was reset while the filter kept its "
                    f"history. Restore the original checkpoint, or "
                    f"start a fresh filter path."
                )
            # OR-merging word maps built under different widths breaks
            # the no-false-negatives guarantee (bit positions are
            # modulo num_bits) — refuse a parameter change mid-history
            if (
                head["num_bits"] != num_bits
                or head["num_hashes"] != num_hashes
            ):
                raise ValueError(
                    f"bloom filter at {bloom_path} was built with "
                    f"num_bits={head['num_bits']}, "
                    f"num_hashes={head['num_hashes']} but the stream "
                    f"was started with num_bits={num_bits}, "
                    f"num_hashes={num_hashes} — merging across "
                    f"parameters would produce false negatives; "
                    f"rebuild the filter from scratch to change them."
                )
            prior = versions.where(F.col("batch_id") < batch_id)
            if not prior.isEmpty():
                basis = prior.orderBy(F.col("batch_id").desc()).limit(1)
        if basis is not None:
            bitmap, nh = bloom_collect(basis)
            classified = batch.withColumn(
                "seen_before", bloom_might_contain(bitmap, nh, F.col(key_col))
            )
        else:
            classified = batch.withColumn("seen_before", F.lit(False))
        (
            classified.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        if crash_hook:
            crash_hook(batch_id, "post_output")

        # fold the batch into a NEW filter version (OR-merge of sparse
        # word maps) — idempotent: replays re-OR set bits
        from implementing_scds_in_hive_spark.operators.bloom import bloom_build

        delta = bloom_build(
            batch.select(key_col), key_col, num_bits=num_bits, num_hashes=num_hashes
        ).select(F.explode("bloom_words").alias("__word", "__bits"))
        if basis is not None:
            base_words = basis.select(
                F.explode("bloom_words").alias("__word", "__bits")
            )
            delta = delta.unionByName(base_words)
        merged_words = delta.groupBy("__word").agg(F.bit_or("__bits").alias("__bits"))
        new_version = (
            merged_words.agg(
                F.map_from_arrays(
                    F.collect_list("__word"), F.collect_list("__bits")
                ).alias("bloom_words")
            )
            .withColumn("num_bits", F.lit(num_bits))
            .withColumn("num_hashes", F.lit(num_hashes))
            .withColumn("batch_id", F.lit(batch_id))
        )
        keep = new_version
        if versions is not None:
            prev = versions.where(F.col("batch_id") < batch_id).orderBy(
                F.col("batch_id").desc()
            ).limit(1)
            keep = new_version.unionByName(prev)
        out = keep.localCheckpoint(eager=True)
        publish(out, bloom_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

def cms_stream(
    events: DataFrame,
    cms_path: str,
    *,
    checkpoint_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 2048,
    portable: bool = False,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Maintain a per-group count-min sketch table from a stream — live
    key-frequency state with ``depth * width`` counters per group,
    however many distinct keys flow past. Like :func:`histogram_stream`
    the merge is a SUM (additive, not idempotent), so it carries the
    same batch-id high-watermark guard against post-publish crash
    replays; the recovery taxonomy in that docstring applies unchanged.

    Output table: ``group_cols..., row int, col int, cnt bigint,
    last_batch_id bigint`` — feed the counter columns to ``cms_lookup``
    for live frequency estimates / heavy-hitter screens (min-over-depth
    never underestimates, so "key X crossed N occurrences" alerts have
    no false negatives)."""
    from implementing_scds_in_hive_spark.operators.sketches import cms_sketch

    g = list(group_cols)
    spark = events.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        existing = _load_state(spark, cms_path)
        watermark = (
            existing.agg(F.max("last_batch_id")).collect()[0][0]
            if existing is not None
            else None
        )
        if _is_replay(batch_id, watermark, cms_path):
            # replayed batch: its increments are already in the table
            return
        delta = cms_sketch(
            batch, g, value_col, depth=depth, width=width, portable=portable
        )
        if existing is not None:
            merged = (
                existing.select(*g, "row", "col", "cnt")
                .unionByName(delta)
                .groupBy(*g, "row", "col")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        out = merged.withColumn("last_batch_id", F.lit(batch_id)).localCheckpoint(
            eager=True
        )
        publish(out, cms_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def category_count_stream(
    events: DataFrame,
    counts_path: str,
    *,
    checkpoint_dir: str,
    cat_col: str,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Maintain a live per-category count table from a stream — the
    state half of a streaming DRIFT monitor. Same additive-state
    recovery mode as :func:`histogram_stream` (sums cannot absorb a
    replayed batch, so the table carries a batch-id high-watermark and
    replays are skipped wholesale).

    Output table: ``category, n, last_batch_id`` — feed it to
    ``operators/drift.py:psi_from_counts`` against a frozen reference
    snapshot for a live PSI, or diff two maintained tables with
    ``chi_square_drift``-style pooling. Splitting state maintenance
    (streaming, tiny additive table) from scoring (a pure batch
    function over the live table) avoids any cross-table commit
    problem: the monitor reads one consistent table whenever it
    likes."""
    spark = events.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        existing = _load_state(spark, counts_path)
        watermark = (
            existing.agg(F.max("last_batch_id")).collect()[0][0]
            if existing is not None
            else None
        )
        if _is_replay(batch_id, watermark, counts_path):
            return
        delta = batch.groupBy(F.col(cat_col).alias("category")).agg(
            F.count(F.lit(1)).alias("n")
        )
        if existing is not None:
            merged = (
                existing.select("category", "n")
                .unionByName(delta)
                .groupBy("category")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = delta
        out = merged.withColumn("last_batch_id", F.lit(batch_id)).localCheckpoint(
            eager=True
        )
        publish(out, counts_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def moment_stream(
    vectors: DataFrame,
    moments_path: str,
    *,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    dim: int,
    trigger_available_now: bool = True,
    crash_hook=None,
) -> StreamingQuery:
    """Maintain a live covariance-moment table (one row: ``n, sumx,
    xtx``) from a vector stream — the state that makes PCA
    CONTINUOUSLY REFRESHABLE: ``operators/pca.py:pca_fit_from_moments``
    turns the table into a model at any time without rescanning
    history, because moments are exactly additive (n and the two sums
    just add). Additive state cannot absorb a replayed batch, so the
    table carries the batch-id watermark like the histogram/CMS
    streams. Per trigger: the batch's partials via the same
    mapInPandas accumulation the batch operator uses, one O(dim^2)
    driver fold, one tiny table publish."""
    import numpy as np

    from implementing_scds_in_hive_spark.operators.pca import covariance_moments

    spark = vectors.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if crash_hook:
            crash_hook(batch_id, "pre")
        state = _load_state(spark, moments_path)
        existing = state.collect()[0] if state is not None else None
        watermark = existing["last_batch_id"] if existing is not None else None
        if _is_replay(batch_id, watermark, moments_path):
            return
        n_b, mean_b, cov_b = covariance_moments(batch, vec_col=vec_col, dim=dim)
        sumx_b = mean_b * n_b
        xtx_b = (cov_b + np.outer(mean_b, mean_b)) * n_b
        if existing is not None:
            n = existing["n"] + n_b
            sumx = np.array(existing["sumx"]) + sumx_b
            xtx = np.array(existing["xtx"]).reshape(dim, dim) + xtx_b
        else:
            n, sumx, xtx = n_b, sumx_b, xtx_b
        out = spark.createDataFrame(
            [(int(n), [float(x) for x in sumx], [float(x) for x in xtx.ravel()], batch_id)],
            "n long, sumx array<double>, xtx array<double>, last_batch_id long",
        )
        publish(out, moments_path, retain_versions=2)
        if crash_hook:
            crash_hook(batch_id, "post_publish")

    writer = (
        vectors.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
