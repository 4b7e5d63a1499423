"""Durable-index scale smoke (VERDICT r4 next-round #1).

Builds the two index structures at the r4 stress scale (50k vectors /
50k docs), SAVES them through operators/index_store.py, drops the
catalog entries (what a process restart loses), reloads from the
sidecar and times the probe paths against their in-memory equivalents —
asserting byte-identical results. The numbers to watch:

* IVF: probe-from-disk with ``probe_prune=True`` should sit near the
  in-memory probe (the scan reads only the probed buckets), and both
  far below the index build — build once, probe for months.
* MinHash: the stored probe reads only the delta's touched buckets
  (literal-IN bucket pruning) instead of bursting the whole in-memory
  index per batch.

Usage: python scripts/index_store_smoke.py [sf_dir]   (default sf0.1)
Results recorded in PLANS.md ("Durable index lifecycle at scale").
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    incremental_minhash_pairs,
    portable_minhash_index,
)
from implementing_scds_in_hive_spark.operators.index_store import (
    incremental_minhash_pairs_stored,
    load_ivf_index,
    save_ivf_index,
    save_minhash_index,
)
from implementing_scds_in_hive_spark.operators.similarity import ivf_assign, ivf_topk
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main(sf_dir: str) -> None:
    spark = get_spark("index-store-smoke")
    work = tempfile.mkdtemp(prefix="index_store_smoke_")
    report = {"sf_dir": sf_dir}
    try:
        # --- IVF at 50k vectors (sf0.1 embeddings × 25 jitter replicas,
        #     the r4 ANN-smoke construction) --------------------------------
        e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        reps = e.select(
            "vec_id", "embedding", F.explode(F.sequence(F.lit(0), F.lit(24))).alias("r")
        ).select(
            (F.col("vec_id") * 25 + F.col("r")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + (F.col("r") - F.lit(12)).cast("float") * F.lit(1e-4),
            ).alias("embedding"),
        ).persist()
        n_vec = reps.count()
        centroids = reps.where(F.col("vec_id") % 1040 == 7).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        n_cent = centroids.count()
        queries = reps.where(F.col("vec_id") % 260 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        n_q = queries.count()

        assigned, t_build = timed(lambda: ivf_assign(reps, centroids).persist())
        assigned.count()
        _, t_save = timed(
            lambda: save_ivf_index(assigned, centroids, "smoke_ivf", f"{work}/ivf")
        )
        mem_probe, t_mem = timed(
            lambda: sorted(
                (r["query_id"], r["rank"], r["vec_id"])
                for r in ivf_topk(assigned, queries, centroids, k=10, nprobe=4).collect()
            )
        )
        spark.sql("DROP TABLE IF EXISTS smoke_ivf_assign")  # simulate restart
        fresh = spark.newSession()
        (re_assigned, re_centroids), t_load = timed(lambda: load_ivf_index(fresh, f"{work}/ivf"))
        disk_probe, t_disk = timed(
            lambda: sorted(
                (r["query_id"], r["rank"], r["vec_id"])
                for r in ivf_topk(
                    re_assigned, queries, re_centroids, k=10, nprobe=4, probe_prune=True
                ).collect()
            )
        )
        assert disk_probe == mem_probe, "stored probe diverged from in-memory probe"
        report["ivf"] = {
            "n_vectors": n_vec, "n_centroids": n_cent, "n_queries": n_q,
            "build_sec": t_build, "save_sec": t_save, "load_sec": t_load,
            "probe_mem_sec": t_mem, "probe_stored_pruned_sec": t_disk,
            "topk_rows": len(mem_probe),
        }
        assigned.unpersist(); reps.unpersist()

        # --- MinHash at 50k docs (sf0.1 × 10 near-identical replicas) -----
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        docs = d.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r")
        ).select(
            (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" zq"), F.col("r").cast("string")))
            .alias("text"),
        ).persist()
        n_docs = docs.count()
        delta = d.where(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" newrev")).alias("text"),
        )
        n_delta = delta.count()

        corpus_index, t_mh_build = timed(lambda: portable_minhash_index(docs).persist())
        corpus_index.count()
        _, t_mh_save = timed(
            lambda: save_minhash_index(
                corpus_index, "smoke_mh", f"{work}/mh", params={"num_perm": 32}
            )
        )
        new_index = portable_minhash_index(delta).localCheckpoint(eager=True)
        mem_pairs, t_mh_mem = timed(
            lambda: sorted(
                (r["id_a"], r["id_b"]) for r in incremental_minhash_pairs(
                    corpus_index, new_index, threshold=0.7
                ).collect()
            )
        )
        spark.sql("DROP TABLE IF EXISTS smoke_mh_docs")
        spark.sql("DROP TABLE IF EXISTS smoke_mh_buckets")
        stored_pairs, t_mh_disk = timed(
            lambda: sorted(
                (r["id_a"], r["id_b"]) for r in incremental_minhash_pairs_stored(
                    spark.newSession(), f"{work}/mh", new_index, threshold=0.7
                ).collect()
            )
        )
        assert stored_pairs == mem_pairs, "stored minhash probe diverged"
        report["minhash"] = {
            "n_docs": n_docs, "n_delta": n_delta,
            "build_sec": t_mh_build, "save_sec": t_mh_save,
            "probe_mem_sec": t_mh_mem, "probe_stored_pruned_sec": t_mh_disk,
            "cross_pairs": len(mem_pairs),
        }
        print(json.dumps(report, indent=2))
    finally:
        for t in ("smoke_ivf_assign", "smoke_mh_docs", "smoke_mh_buckets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
