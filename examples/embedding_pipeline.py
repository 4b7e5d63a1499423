"""Embedding-side pipeline walkthrough: the engine's vector operators
composed end-to-end over the testdata embeddings table — the
"embeddings half" of a training-data platform (the text half is
examples/training_data_pipeline.py).

    raw embeddings
      → near-duplicate removal    (similarity.py sign-bit blocking)
      → PCA model fit             (pca.py — one Arrow moment pass)
      → drift check               (drift.py KS on the top PCA score:
                                   did dedup skew the distribution?)
      → int8 storage tier         (similarity.py quantize_corpus)
      → IVF index build + save    (index_store.py — durable, bucketed)
      → ANN probes, three tiers   (exact / IVF-from-disk / trained-PCA
                                   coarse rescore — cross-checked)

Each stage's operator is individually value-verified against a DuckDB
oracle elsewhere (COVERAGE.md maps them); this script shows the
composition and cross-checks tier agreement on live results.

Run: python examples/embedding_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.drift import ks_statistic
from implementing_scds_in_hive_spark.operators.index_store import (
    build_ivf_index,
    load_ivf_index,
)
from implementing_scds_in_hive_spark.operators.pca import pca_fit, pca_transform
from implementing_scds_in_hive_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    ivf_topk,
    pca_rescore_topk,
    quantize_corpus,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding-pipeline", cpus=8)
    work = tempfile.mkdtemp(prefix="emb_pipeline_")
    try:
        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        n0 = emb.count()
        print(f"raw:                {n0:6d} vectors")

        # 1. drop near-duplicate vectors (keep lowest id per pair group)
        dups = embedding_near_duplicates(emb, threshold=0.999)
        drop = dups.select(F.col("id_b").alias("vec_id")).distinct()
        emb = emb.join(drop, "vec_id", "left_anti").persist()
        print(f"after near-dedup:   {emb.count():6d} vectors")

        # 2. fit a PCA model (one Arrow moment pass, driver-side eigh)
        model = pca_fit(emb, 16, dim=64)
        print(f"PCA-16 explained:   {sum(model.explained_ratio):6.1%} of variance")

        # 3. drift audit: did dedup shift the corpus geometry? KS on
        #    the dominant PCA score, survivors vs full corpus
        full = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        score1 = lambda df: pca_transform(df, model).select(  # noqa: E731
            F.round(F.element_at("scores", 1), 9).alias("s1")
        )
        ks = ks_statistic(score1(emb), score1(full), "s1").collect()[0]
        print(f"dedup-drift KS:     {ks['ks']:.4f}  (n={ks['n_a']} vs {ks['n_b']})")

        # 4. int8 storage tier (the 4x-smaller format probes read)
        q8 = quantize_corpus(emb)
        print(f"int8 tier:          {q8.count():6d} rows quantized")

        # 5. durable IVF index: build once, save, reload as a fresh
        #    process would, probe from disk
        ivf_root = f"{work}/ivf"
        build_ivf_index(emb, "pipeline_ivf", ivf_root, k=16)
        assigned, centroids = load_ivf_index(spark, ivf_root)
        queries = full.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        # 6. three ANN tiers over the same queries, cross-checked
        exact = cosine_topk(emb, queries, k=5)
        via_ivf = ivf_topk(
            assigned, queries, centroids, k=5, nprobe=4, probe_prune=True
        )
        via_pca = pca_rescore_topk(emb, queries, model, k=5, shortlist=80)
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        i = {(r["query_id"], r["vec_id"]) for r in via_ivf.collect()}
        p = {(r["query_id"], r["vec_id"]) for r in via_pca.collect()}
        print(f"ANN recall vs exact: ivf-from-disk {len(e & i) / len(e):.2f}, "
              f"pca-rescore {len(e & p) / len(e):.2f}  (top-5, {queries.count()} queries)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
