"""Dedup-tier scale smoke (VERDICT r3 next-round #6).

Runs the two text-dedup tiers on the largest available corpus and
reports the numbers that matter at scale: candidate-pair counts (the
join fan-out each tier generates BEFORE verification/thresholding) and
wall time, plus a ``max_doc_freq`` sweep for the exhaustive n-gram tier
to pick a stop-gram cap that bounds fan-out without losing true pairs.

Usage: python scripts/dedup_scale_smoke.py [sf_dir]   (default sf0.1)
Results are recorded in PLANS.md ("Dedup tiers at scale").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators import dedup
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main(sf_dir: str) -> None:
    spark = get_spark("dedup-scale-smoke")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    report = {"sf_dir": sf_dir, "n_docs": n_docs}

    # --- MinHash LSH tier: candidates vs verified pairs ---------------
    sh = dedup.shingled_hashes(docs, "doc_id", "text", n=3).persist()
    sh.count()
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda i: F.array_min(F.transform("sh", lambda h: F.xxhash64(i, h))),
    )
    banded = (
        sh.select("did", sig.alias("sig"))
        .select("did", F.explode(dedup._band_buckets(32, 8)).alias("bb"))
        .select("did", "bb.band", "bb.bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .distinct()
    )
    n_cand, t_cand = timed(cand.count)
    pairs, t_full = timed(
        lambda: dedup.minhash_lsh_pairs(docs, threshold=0.8).count()
    )
    report["minhash_lsh"] = {
        "candidate_pairs": n_cand,
        "candidate_gen_sec": t_cand,
        "verified_pairs": pairs,
        "end_to_end_sec": t_full,
        "all_pairs_would_be": n_docs * (n_docs - 1) // 2,
    }
    sh.unpersist()

    # --- Exhaustive n-gram tier: max_doc_freq sweep -------------------
    # Candidate pairs = distinct (id_a, id_b) sharing >= 1 surviving
    # shingle (the fan-out of the inverted-index self-join).
    sweep = {}
    baseline_pairs = None
    for cap in (None, 1000, 100, 50, 20):
        sh2 = dedup.shingled_hashes(docs, "doc_id", "text", n=3).persist()
        inv = sh2.select("did", F.explode("sh").alias("hs"))
        if cap is not None:
            freq = inv.groupBy("hs").agg(F.count(F.lit(1)).alias("df"))
            inv = inv.join(freq.where(F.col("df") <= cap), "hs", "left_semi")
        aa, bb = inv.alias("a"), inv.alias("b")
        n_c, t_c = timed(
            aa.join(
                bb,
                (F.col("a.hs") == F.col("b.hs")) & (F.col("a.did") < F.col("b.did")),
            )
            .select("a.did", "b.did")
            .distinct()
            .count
        )
        n_p, t_p = timed(
            lambda c=cap: dedup.ngram_jaccard_pairs(
                docs, threshold=0.8, max_doc_freq=c
            ).count()
        )
        if baseline_pairs is None:
            baseline_pairs = n_p
        sweep[str(cap)] = {
            "candidate_pairs": n_c,
            "candidate_gen_sec": t_c,
            "result_pairs": n_p,
            "end_to_end_sec": t_p,
            "true_pairs_lost": baseline_pairs - n_p,
        }
        sh2.unpersist()
    report["ngram_jaccard_sweep"] = sweep

    # --- Prefix-filtered exact tier (lossless, bounded) ---------------
    # Candidates = distinct pairs sharing a PREFIX shingle and passing
    # the length filter — the quantity that replaces the cap sweep's
    # fan-out, with zero recall loss by construction.
    t = 0.8
    sh3 = dedup.shingled_hashes(docs, "doc_id", "text", n=3).persist()
    inv3 = sh3.select("did", F.explode("sh").alias("hs"))
    freq3 = inv3.groupBy("hs").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        inv3.join(freq3, "hs")
        .groupBy("did")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "hs"))).alias("osh"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "did",
            "sz",
            F.slice(
                F.transform("osh", lambda s: s["hs"]),
                1,
                (F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - 1e-9) + 1).cast("int"),
            ).alias("prefix"),
        )
    )
    pf = ordered.select("did", "sz", F.explode("prefix").alias("hs"))
    pa, pb = pf.alias("a"), pf.alias("b")
    n_pc, t_pc = timed(
        pa.join(
            pb,
            (F.col("a.hs") == F.col("b.hs"))
            & (F.col("a.did") < F.col("b.did"))
            & (F.least("a.sz", "b.sz").cast("double")
               >= F.lit(t) * F.greatest("a.sz", "b.sz") - 1e-9),
        )
        .select("a.did", "b.did")
        .distinct()
        .count
    )
    n_pp, t_pp = timed(
        lambda: dedup.jaccard_prefix_pairs(docs, threshold=t).count()
    )
    report["jaccard_prefix"] = {
        "candidate_pairs": n_pc,
        "candidate_gen_sec": t_pc,
        "result_pairs": n_pp,
        "end_to_end_sec": t_pp,
        "true_pairs_lost": (baseline_pairs - n_pp) if baseline_pairs is not None else None,
    }
    sh3.unpersist()

    # --- Winnowing tier: selected-index density + passage join --------
    fps = dedup.winnow_fingerprints(docs, n=3, w=8).persist()
    n_sel, t_fp = timed(lambda: fps.select(F.explode("fps")).count())
    full_postings = report.get("full_shingle_postings")
    if full_postings is None:
        full_postings = (
            dedup.shingled_hashes(docs, "doc_id", "text", n=3)
            .select(F.explode("sh"))
            .count()
        )
    n_pairs, t_pairs = timed(
        lambda: dedup.shared_passage_candidates(fps, min_shared=2).count()
    )
    report["winnow_w8"] = {
        "selected_postings": n_sel,
        "full_shingle_postings": full_postings,
        "density": round(n_sel / full_postings, 4),
        "fingerprint_sec": t_fp,
        "passage_pairs_min2": n_pairs,
        "passage_join_sec": t_pairs,
    }
    fps.unpersist()

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
