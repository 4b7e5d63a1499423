"""Scale smoke for the round-5 additions: KMV sketch, bloom join
pruning, KNN self-join.

What it measures (recorded in PLANS.md "Round-5 operators at scale"):
* KMV distinct at 4M rows / ~800k distinct per group: estimate error vs
  exact count_distinct, and wall time for both — the sketch must be in
  the same time class while carrying only k values per group forward
  (the exact path carries the full distinct set; at 100 TB only one of
  those fits).
* Bloom semi join at 4M facts vs a 1%-selective dim, broadcast
  disabled (the can't-broadcast regime the operator exists for):
  survivor count after the bitmap prefilter (the rows that actually pay
  the shuffle) and wall time vs the plain shuffled semi join.
* knn_join_ivf at 50k vectors x 16 centroids: wall time per nprobe and
  recall@5 vs numpy exact on a 200-vector sample.

Usage: python scripts/sketch_bloom_knn_smoke.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.bloom import (
    bloom_build,
    bloom_collect,
    bloom_prefilter,
    bloom_semi_join,
)
from implementing_scds_in_hive_spark.operators.sketches import kmv_distinct
from implementing_scds_in_hive_spark.operators.similarity import ivf_assign, knn_join_ivf
from implementing_scds_in_hive_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("sketch-bloom-knn-smoke")
    report = {}

    # --- KMV at 4M rows ----------------------------------------------
    big = (
        spark.range(4_000_000)
        .select(
            (F.col("id") % 4).cast("string").alias("g"),
            # ~800k distinct values per group, heavy re-hits
            F.xxhash64((F.col("id") * F.lit(2654435761)) % 800_000, F.col("id") % 4).alias("v"),
        )
        .persist()
    )
    big.count()
    exact, t_exact = timed(
        lambda: {
            r.g: r.d
            for r in big.groupBy("g").agg(F.count_distinct("v").alias("d")).collect()
        }
    )
    est, t_kmv = timed(
        lambda: {
            r.g: r.est_distinct
            for r in kmv_distinct(big, ["g"], "v", k=512).collect()
        }
    )
    errs = [abs(est[g] - exact[g]) / exact[g] for g in exact]
    report["kmv"] = {
        "rows": 4_000_000,
        "exact_per_group": exact,
        "t_exact_count_distinct_s": t_exact,
        "t_kmv_k512_s": t_kmv,
        "max_rel_err": round(max(errs), 4),
    }
    big.unpersist()

    # --- CMS heavy hitters at 4M rows --------------------------------
    # 4 groups; per group ~250k distinct cold keys (1 hit each tier) and
    # 10 planted hot keys taking every 20th row (~12.5k hits each): the
    # bot-detection shape. CMS must (a) find every true heavy hitter —
    # no false negatives by construction — and (b) keep the sketch
    # bounded at depth*width counters per group.
    from implementing_scds_in_hive_spark.operators.sketches import (
        cms_heavy_hitters,
        cms_sketch,
    )

    # g and the hot-key id must not share factors with the %20 stride or
    # the hot rows all collapse onto one (group, key) cell — hash the
    # group and derive the hot key from id/20 so the 200k hot rows
    # spread over 4 groups x 10 keys (~5k hits each).
    ev = (
        spark.range(4_000_000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(4)).cast("string").alias("g"),
            F.when(F.col("id") % 20 == 0, (F.col("id") / 20).cast("long") % 10)
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) + 1000)
            .alias("v"),
        )
        .persist()
    )
    ev.count()
    threshold = 3_000
    exact_hh, t_exact_hh = timed(
        lambda: {
            (r.g, r.v)
            for r in ev.groupBy("g", "v")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= threshold)
            .collect()
        }
    )
    cms_hh, t_cms_hh = timed(
        lambda: {
            (r.g, r.v)
            for r in cms_heavy_hitters(
                ev, ["g"], "v", min_count=threshold, depth=4, width=4096
            ).collect()
        }
    )
    assert exact_hh <= cms_hh, "CMS dropped a true heavy hitter"
    sketch_rows, t_cms_build = timed(
        lambda: cms_sketch(ev, ["g"], "v", depth=4, width=4096).count()
    )
    report["cms"] = {
        "rows": 4_000_000,
        "true_heavy_hitters": len(exact_hh),
        "cms_survivors": len(cms_hh),
        "spurious": len(cms_hh - exact_hh),
        "sketch_rows": sketch_rows,
        "t_exact_groupby_s": t_exact_hh,
        "t_cms_heavy_hitters_s": t_cms_hh,
        "t_cms_sketch_build_s": t_cms_build,
    }
    ev.unpersist()

    # --- bloom at 4M facts, 1% dim -----------------------------------
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact = spark.range(4_000_000).select(
        (F.xxhash64("id") % 1_000_000).alias("k"), F.col("id").alias("payload")
    ).persist()
    n_fact = fact.count()
    dim = spark.range(10_000).select((F.col("id") * 100).alias("k")).persist()
    dim.count()
    plain, t_plain = timed(lambda: fact.join(dim, "k", "left_semi").count())
    bloom = bloom_build(dim, "k", num_bits=1 << 20)
    collected, t_build = timed(lambda: bloom_collect(bloom))
    survivors, t_pref = timed(lambda: bloom_prefilter(fact, collected, "k").count())
    via_bloom, t_bloom = timed(
        lambda: bloom_semi_join(fact, dim, "k", num_bits=1 << 20).count()
    )
    assert via_bloom == plain, (via_bloom, plain)
    report["bloom"] = {
        "fact_rows": n_fact,
        "dim_rows": 10_000,
        "semi_matches": plain,
        "prefilter_survivors": survivors,
        "shuffle_reduction_x": round(n_fact / max(survivors, 1), 1),
        "t_plain_semi_s": t_plain,
        "t_bloom_build_collect_s": t_build,
        "t_prefilter_only_s": t_pref,
        "t_bloom_semi_total_s": t_bloom,
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    fact.unpersist(); dim.unpersist()

    # --- knn_join_ivf at 50k vectors ---------------------------------
    # mixture of 16 gaussians: embedding corpora are clustered (that is
    # WHY IVF works); uniform-random vectors are the adversarial case
    # where any partition-based ANN degrades to its probe fraction
    rng = np.random.default_rng(5)
    dim_d = 32
    centers = rng.normal(size=(16, dim_d)) * 3.0
    mat = (
        centers[rng.integers(0, 16, size=50_000)]
        + rng.normal(size=(50_000, dim_d))
    ).astype("float32")
    vec_df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(len(mat))],
        "vec_id long, embedding array<float>",
    ).persist()
    vec_df.count()
    cents = vec_df.where(F.col("vec_id") % 3125 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(vec_df, cents).persist()
    assigned.count()
    knn_times = {}
    sample_ids = list(range(0, 50_000, 250))  # 200 sampled vectors
    nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nmat[sample_ids] @ nmat.T
    truth = {}
    for row_i, vid in enumerate(sample_ids):
        order = np.argsort(-np.round(sims[row_i], 6))
        truth[vid] = [int(j) for j in order if j != vid][:5]
    for nprobe in (1, 2):
        out, t = timed(
            lambda np_=nprobe: knn_join_ivf(assigned, cents, k=5, nprobe=np_)
            .where(F.col("vec_id").isin(sample_ids))
            .collect()
        )
        got = {}
        for r in sorted(out, key=lambda r: (r.vec_id, r.rank)):
            got.setdefault(r.vec_id, []).append(r.neighbor_id)
        hits = sum(len(set(got.get(v, [])) & set(truth[v])) for v in sample_ids)
        knn_times[f"nprobe{nprobe}"] = {
            "t_s": t,
            "recall_at_5": round(hits / (5 * len(sample_ids)), 3),
        }
    report["knn_ivf_50k"] = knn_times

    # --- quantized tier at 50k vectors -------------------------------
    import os
    import tempfile

    from implementing_scds_in_hive_spark.operators.similarity import (
        cosine_topk,
        quantize_corpus,
        quantized_rescore_topk,
    )

    cq = quantize_corpus(vec_df).persist()
    cq.count()
    with tempfile.TemporaryDirectory() as td:
        fp, qp = os.path.join(td, "full"), os.path.join(td, "quant")
        vec_df.write.parquet(fp)
        cq.write.parquet(qp)

        def dsize(d):
            return sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        ratio = round(dsize(fp) / dsize(qp), 2)
    qdf = vec_df.where(F.col("vec_id").isin(sample_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_res, t_exact_knn = timed(
        lambda: {(r.query_id, r.vec_id) for r in cosine_topk(vec_df, qdf, k=5).collect()}
    )
    qres, t_q = timed(
        lambda: {
            (r.query_id, r.vec_id)
            for r in quantized_rescore_topk(cq, vec_df, qdf, k=5).collect()
        }
    )
    report["quantized_50k"] = {
        "parquet_shrink_x": ratio,
        "t_full_bruteforce_s": t_exact_knn,
        "t_coarse_plus_rescore_s": t_q,
        "recall_at_5": round(len(qres & exact_res) / len(exact_res), 3),
    }
    cq.unpersist()

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
