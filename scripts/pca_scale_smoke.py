"""PCA scale smoke: the covariance moment pass at 500k x 64 vectors
(sf0.1 embeddings x 100 jitter replicas). The claim that must hold at
100 TB: the corpus is read once with NO shuffle (per-partition numpy
partials, O(#partitions) driver rows), so wall time is linear in
corpus size and the transform stage is plain JVM projection.

Usage: python scripts/pca_scale_smoke.py [n_replicas]
Results recorded in PLANS.md ("PCA at scale").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.pca import covariance_moments, pca_fit, pca_transform
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def main(reps: int) -> None:
    spark = get_spark("pca-scale-smoke")
    e = load_table(spark, "/root/testdata/sf0.1", "embeddings").select("vec_id", "embedding")
    big = e.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("r"),
    ).select(
        (F.col("vec_id") * reps + F.col("r")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + (F.pmod(F.xxhash64(F.col("vec_id"), F.col("r")), 1000) / 1000000.0 - 0.0005),
        ).alias("embedding"),
    ).repartition(32).persist()
    n = big.count()

    t0 = time.time()
    cnt, mean, cov = covariance_moments(big, dim=64)
    t_mom = time.time() - t0
    assert cnt == n

    t0 = time.time()
    model = pca_fit(big, 16, dim=64)
    t_fit = time.time() - t0

    t0 = time.time()
    out = pca_transform(big, model).select(F.sum(F.element_at("scores", 1))).collect()
    t_tr = time.time() - t0

    # small-corpus model must agree with the replicated-corpus model on
    # the dominant subspace (jitter is tiny): top eigenvalue within 5%
    small = pca_fit(e, 1, dim=64)
    rel = abs(model.explained_variance[0] - small.explained_variance[0]) / small.explained_variance[0]

    print(json.dumps({
        "n_vectors": n,
        "moments_sec": round(t_mom, 2),
        "fit_sec": round(t_fit, 2),
        "transform_full_corpus_sec": round(t_tr, 2),
        "top_eig_vs_base_rel_diff": round(rel, 4),
        "explained_ratio_16": round(sum(model.explained_ratio), 4),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
