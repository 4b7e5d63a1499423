"""Streaming dedup against the durable MinHash index: each micro-batch
is probed against the stored corpus, then folded in, so a LATER batch's
duplicate of an EARLIER batch's doc is caught through the index alone —
the property that distinguishes index-maintaining streaming dedup from
per-batch dedup. Also pins restart idempotence (checkpoint + per-batch
dynamic partition overwrite + append guard)."""

import time

import pytest

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import portable_minhash_index
from implementing_scds_in_hive_spark.operators.index_store import (
    load_minhash_index,
    save_minhash_index,
)
from implementing_scds_in_hive_spark.sources.registry import load_table
from implementing_scds_in_hive_spark.streaming.dedup_stream import minhash_dedup_stream
from implementing_scds_in_hive_spark.sources.snapshot import read_table


def _pairs(spark, path):
    return {
        (r["batch_id"], r["id_a"], r["id_b"])
        for r in read_table(spark, path).collect()
    }


def test_stream_dedups_across_batches_via_index(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.where(F.col("doc_id") < 300)
    index_root = str(tmp_path / "mh")
    idx = portable_minhash_index(corpus).persist()
    save_minhash_index(idx, "t_stream_mh", index_root, params={"n": 3, "num_perm": 32, "bands": 8})

    # batch 0: a clone of a corpus doc (cross pair), a brand-new doc
    # pair that duplicates itself (intra pair), and a unique doc X
    base = {r["doc_id"]: r["text"] for r in corpus.where("doc_id in (5, 7)").collect()}
    x_text = "the unique streaming document about spark bucketed index maintenance " * 3
    b0 = [
        (100_005, base[5]),              # near/exact dup of corpus doc 5
        (200_001, x_text), (200_002, x_text),  # intra-batch dup pair
        (300_001, "x " + x_text),        # X: near-dup of 200_00x too
    ]
    # batch 1: a clone of batch 0's doc X — only findable via the index
    b1 = [(400_001, x_text + " tail"), (500_001, base[7])]

    stg = str(tmp_path / "docs_stream")
    for chunk in (b0, b1):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(stg)
        time.sleep(0.05)

    pairs_path = str(tmp_path / "pairs")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stg)
        )
        q = minhash_dedup_stream(
            stream,
            index_root,
            pairs_path,
            checkpoint_dir=str(tmp_path / "ckpt"),
            threshold=0.7,
        )
        q.awaitTermination(120)

    try:
        run()
        got = _pairs(spark, pairs_path)

        # cross pair from the pre-built corpus
        assert (0, 5, 100_005) in got
        # intra-batch pair, lower id first
        assert (0, 200_001, 200_002) in got
        # the decisive case: batch 1's clone pairs with batch 0 docs
        # THROUGH the index (they were appended after batch 0)
        batch1_cross = {p for p in got if p[0] == 1 and p[1] in (200_001, 200_002)}
        assert batch1_cross, f"index append did not carry batch 0 into batch 1: {got}"
        assert (1, 7, 500_001) in got  # original corpus still probed too

        # index grew by exactly the streamed docs
        docs_t, buckets_t, _ = load_minhash_index(spark, index_root)
        assert docs_t.count() == corpus.count() + len(b0) + len(b1)
        assert buckets_t.count() == 8 * (corpus.count() + len(b0) + len(b1))

        # restart with the same checkpoint: nothing replays, nothing grows
        run()
        assert _pairs(spark, pairs_path) == got
        assert docs_t.count() == corpus.count() + len(b0) + len(b1)
    finally:
        idx.unpersist()
        for t in ("t_stream_mh_docs", "t_stream_mh_buckets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_stream_recovers_from_crash_in_every_window(spark, sf_dir, tmp_path):
    """Kill the stream in each phase — before work, after the pairs
    publish (pairs visible, index NOT appended: the dangerous window),
    and after the append (all effects done, checkpoint uncommitted) —
    restart, and require the final pairs AND index to equal the
    crash-free run's."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.where(F.col("doc_id") < 200)

    clone = d.where("doc_id = 11").first()["text"]
    batches = [
        [(910_000, clone), (910_001, clone + " v2")],
        [(920_000, clone + " v3")],
        [(930_000, clone + " v4")],
    ]

    def run_chain(tag, crash_plan, **stream_kwargs):
        root = str(tmp_path / f"mh_{tag}")
        idx = portable_minhash_index(corpus).localCheckpoint(eager=True)
        save_minhash_index(idx, f"t_cr_{tag}", root, params={})
        stg = str(tmp_path / f"stg_{tag}")
        for chunk in batches:
            spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
                1
            ).write.mode("append").parquet(stg)
            time.sleep(0.05)
        pairs_path = str(tmp_path / f"pairs_{tag}")
        fired = set()

        def hook(batch_id, phase):
            if crash_plan.get(batch_id) == phase and batch_id not in fired:
                fired.add(batch_id)
                raise RuntimeError(f"injected death: batch {batch_id} at {phase}")

        attempts = 0
        while True:
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", "1")
                .parquet(stg)
            )
            q = minhash_dedup_stream(
                stream, root, pairs_path,
                checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
                threshold=0.5, crash_hook=hook, **stream_kwargs,
            )
            try:
                q.awaitTermination(120)
                break
            except Exception:
                q.stop()
                attempts += 1
                assert attempts <= len(crash_plan) + 1
        assert fired == set(crash_plan)
        docs_t, _, _ = load_minhash_index(spark, root)
        result = (_pairs(spark, pairs_path), docs_t.count())
        for t in (f"t_cr_{tag}_docs", f"t_cr_{tag}_buckets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        return result

    baseline = run_chain("clean", {})
    assert baseline[0], "fixture must produce pairs"
    for tag, plan in (
        ("pre", {0: "pre"}),
        ("postpairs", {1: "post_pairs"}),
        ("postappend", {2: "post_append"}),
        ("multi", {0: "post_pairs", 2: "pre"}),
    ):
        assert run_chain(tag, plan) == baseline, tag

    # maintenance on (VERDICT r5 #5): compact after EVERY batch (the
    # aggressive 1.0 files-per-bucket policy) — with and without a crash
    # landing after maintenance ran — results must equal the unmaintained
    # crash-free chain: maintenance is invisible to answers.
    maint = dict(maintain_every=1, maintain_max_files_per_bucket=1.0)
    assert run_chain("maint", {}, **maint) == baseline
    assert run_chain("maintcrash", {1: "post_append"}, **maint) == baseline
