"""Streaming-dedup scale smoke: per-trigger cost as the index grows.

Builds the 50k-doc corpus index, then streams N delta batches (each
with planted clones of corpus docs AND of earlier batches' docs)
through ``minhash_dedup_stream``. The claim under test: per-trigger
cost is O(batch + touched buckets) — flat as the corpus index grows —
because the probe reads the index tables, never re-derives them, and
the per-batch append adds one file per touched bucket. Reports each
micro-batch's duration from the streaming progress log plus pair
counts and final index size.

Usage: python scripts/dedup_stream_smoke.py [sf_dir] [n_batches]
Results recorded in PLANS.md ("Streaming dedup against the durable
index").
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import portable_minhash_index
from implementing_scds_in_hive_spark.operators.index_store import (
    load_minhash_index,
    save_minhash_index,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table
from implementing_scds_in_hive_spark.streaming.dedup_stream import minhash_dedup_stream


def main(sf_dir: str, n_batches: int) -> None:
    spark = get_spark("dedup-stream-smoke")
    work = tempfile.mkdtemp(prefix="dedup_stream_smoke_")
    try:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        base = d.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r")
        ).select(
            (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" zq"), F.col("r").cast("string")))
            .alias("text"),
        )
        t0 = time.time()
        idx = portable_minhash_index(base).persist()
        n_corpus = idx.count()
        save_minhash_index(idx, "smoke_ds", f"{work}/mh", params={"num_perm": 32})
        t_build = round(time.time() - t0, 2)
        idx.unpersist()

        # each batch: 400 fresh-id clones of corpus docs + 100 clones of
        # the PREVIOUS batch's docs (cross-batch dups via the index)
        stg = f"{work}/stg"
        for b in range(n_batches):
            batch = d.where(F.col("doc_id") % n_batches == b).limit(400).select(
                (F.col("doc_id") + (b + 1) * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rev{b}")).alias("text"),
            )
            if b > 0:
                prev = d.where(F.col("doc_id") % n_batches == b - 1).limit(100).select(
                    (F.col("doc_id") + (b + 1) * 1_000_000 + 500_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" rev{b-1}")).alias("text"),
                )
                batch = batch.unionByName(prev)
            batch.coalesce(1).write.mode("append").parquet(stg)
            time.sleep(0.05)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stg)
        )
        t0 = time.time()
        q = minhash_dedup_stream(
            stream,
            f"{work}/mh",
            f"{work}/pairs",
            checkpoint_dir=f"{work}/ckpt",
            threshold=0.7,
        )
        q.awaitTermination(560)
        t_stream = round(time.time() - t0, 2)

        per_batch = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "sec": round(p["batchDuration"] / 1000, 2),
            }
            for p in (json.loads(pr.json) for pr in q.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        pairs = spark.read.parquet(f"{work}/pairs")
        by_batch = {
            int(r["batch_id"]): r["n"]
            for r in pairs.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
        }
        docs_t, _, _ = load_minhash_index(spark, f"{work}/mh")
        print(json.dumps({
            "sf_dir": sf_dir,
            "corpus_docs": n_corpus,
            "index_build_save_sec": t_build,
            "stream_total_sec": t_stream,
            "per_trigger": per_batch,
            "pairs_by_batch": by_batch,
            "final_index_docs": docs_t.count(),
        }, indent=1))
    finally:
        for t in ("smoke_ds_docs", "smoke_ds_buckets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
