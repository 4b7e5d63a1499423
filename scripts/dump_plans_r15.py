"""Dump `.explain("formatted")` before/after evidence for the r15
optimization round into plans/r15/.

Two kinds of dumps:

* registry slots — the driver query itself (same as r14's dumps);
* operator paths — built directly on the sf tables with both backends,
  including the pre-checkpoint PAIRS stage of semantic_dedup (r14
  VERDICT "what's wrong" #3: the survivors query hides the optimized
  stage behind canonical_members' localCheckpoint, so the slot-level
  dump cannot show it; this dumps the stage that FEEDS the checkpoint).

Usage: python scripts/dump_plans_r15.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "plans", "r15")


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(name: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.txt")
    with open(path, "w") as f:
        f.write(_fmt(df))
    print(f"wrote {path}")


def knn_join_ivf_pair(spark, sf_dir):
    from implementing_scds_in_hive_spark.operators.similarity import knn_join_ivf

    e = _t(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    dump("knn_join_ivf_before", knn_join_ivf(e, cents, k=5, nprobe=2, backend="builtin"))
    dump("knn_join_ivf_after", knn_join_ivf(e, cents, k=5, nprobe=2, backend="arrow"))


def semantic_dedup_pairs_pair(spark, sf_dir):
    from implementing_scds_in_hive_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") % 25 == 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    dump(
        "semantic_dedup_pairs_stage_before",
        semantic_dedup_pairs(e, cents, threshold=0.3, backend="builtin"),
    )
    dump(
        "semantic_dedup_pairs_stage_after",
        semantic_dedup_pairs(e, cents, threshold=0.3, backend="arrow"),
    )


def kmeans_iteration_pair(spark, sf_dir):
    """One Lloyd iteration's per-iteration JOB (kmeans_refine collects
    between iterations, so the refined RESULT is a local relation whose
    plan shows nothing): before = the builtin assignment + posexplode →
    decimal partial-agg means stage; after = the fused
    assign_mean_partials map pass that replaced it."""
    from implementing_scds_in_hive_spark.operators.similarity import ivf_assign
    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        assign_mean_partials,
    )

    e = _t(spark, sf_dir, "embeddings")
    seed = e.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    mean_expr = (
        F.sum(F.col("__x").cast("decimal(27,10)")).cast("double")
        / F.count(F.lit(1))
    ).alias("__m")
    assigned = ivf_assign(e, seed, backend="builtin")
    means = (
        assigned.select("centroid_id", F.posexplode("embedding").alias("__pos", "__x"))
        .groupBy("centroid_id", "__pos")
        .agg(mean_expr)
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm"))
        .select(
            "centroid_id",
            F.transform("__pm", lambda s: s["__m"]).cast("array<float>").alias("embedding"),
        )
    )
    dump("kmeans_refine_iteration_before", means)
    dump(
        "kmeans_refine_iteration_after",
        assign_mean_partials(
            e, seed, id_col="vec_id", vec_col="embedding",
            centroid_id_col="centroid_id",
        ),
    )


DUMPS = {
    "knn_join_ivf": knn_join_ivf_pair,
    "semantic_dedup_pairs_stage": semantic_dedup_pairs_pair,
    "kmeans_refine_iteration": kmeans_iteration_pair,
}


def registry_dump(spark, sf_dir, name: str, suffix: str) -> None:
    from implementing_scds_in_hive_spark.plans.registry import queries

    dump(f"{name}_{suffix}", queries()[name](spark, sf_dir))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    spark = get_spark("dump-plans-r15", cpus=8)
    for name in names or DUMPS:
        if name in DUMPS:
            DUMPS[name](spark, sf_dir)
        else:
            # registry slot: name[:before|after] — default "after"
            base, _, suffix = name.partition(":")
            registry_dump(spark, sf_dir, base, suffix or "after")
    spark.stop()


if __name__ == "__main__":
    main()
