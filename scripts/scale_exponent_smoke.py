"""Scale-exponent smoke for the top operator tiers (VERDICT r11 #6).

Runs the flagship SCD2 merge, portable MinHash LSH, the IVF probe path
and pack_sequences at sf0.1 and at a synthesized 10x of it (no sf1.0
testdata ships, so the 10x corpus is the sf0.1 tables replicated with
re-keyed ids — same distributions, 10x cardinality), then reports the
scaling exponent  e = log(t_10x / t_1x) / log(10)  per query.

e ~= 1.0 is linear (what the bucketed/blocked plans claim); e >= ~1.5
would indicate a quadratic term sneaking in (candidate blow-up, an
unbounded self-join). Numbers recorded in PLANS.md ("Scale exponents").

Usage: python scripts/scale_exponent_smoke.py [replication=10]
Run on a QUIET machine — a concurrent suite doubles timings.
"""

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def _docs(spark, mult: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if mult == 1:
        return d
    return d.withColumn(
        "__copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    ).select(
        (F.col("doc_id") + F.col("__copy").cast("long") * F.lit(10_000_000)).alias("doc_id"),
        # tag EVERY token with the copy id: replicas share no shingles
        # with the original or each other, so near-dup DENSITY stays
        # constant as the corpus grows (a suffix-only perturbation made
        # each doc a mult-clique — quadratic pairs by construction of
        # the synthetic data, not of the algorithm)
        F.when(F.col("__copy") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(
                        F.lit("c"), F.col("__copy").cast("string"),
                        F.lit("_"), t,
                    ),
                ),
                " ",
            )
        ).alias("text"),
        *[c for c in d.columns if c not in ("doc_id", "text")],
    )


def _embeddings(spark, mult: int):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if mult == 1:
        return e
    return e.withColumn(
        "__copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    ).select(
        (F.col("vec_id") + F.col("__copy").cast("long") * F.lit(10_000_000)).alias("vec_id"),
        # rotate replicated vectors by one position so copies are not
        # exact duplicates (keeps norms, changes neighbors)
        F.when(F.col("__copy") == 0, F.col("embedding"))
        .otherwise(
            F.concat(
                F.slice(F.col("embedding"), 2, 10_000),
                F.slice(F.col("embedding"), 1, 1),
            )
        )
        .alias("embedding"),
    )


def _customers(spark, mult: int):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    if mult == 1:
        return c
    # replicate via a distributed range cross join, NOT an in-row
    # sequence explode: sequence(0, mult-1) materializes a mult-element
    # array PER ROW before exploding — at mult=10000 that is a ~100 MB
    # allocation per columnar batch and the 8g default heap OOMs (r13).
    # The broadcast range streams the expansion row-by-row instead.
    reps = spark.range(mult).select(F.col("id").alias("__copy"))
    return c.crossJoin(F.broadcast(reps)).select(
        (F.col("c_custkey") + F.col("__copy") * F.lit(10_000_000)).alias(
            "c_custkey"
        ),
        *[col for col in c.columns if col != "c_custkey"],
    ).drop("__copy")


def _timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def flagship_merge(spark, mult):
    from implementing_scds_in_hive_spark.operators.scd import (
        SCDConfig,
        scd2_merge,
    )

    cfg = SCDConfig(
        key="c_custkey",
        type2_cols=("c_acctbal", "c_mktsegment"),
        type1_cols=("c_name", "c_nationkey"),
        surrogate_col="dim_id",
        end_of_time="2260-12-31 23:59:59",
    )
    c = _customers(spark, mult)
    prod = c.select(
        F.lit(None).cast("long").alias("dim_id"),
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        F.lit(1).alias("scd_version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit("2260-12-31 23:59:59").cast("timestamp").alias("scd_end_date"),
        F.lit(True).alias("scd_active"),
    )
    stag = c.select(
        "c_custkey", "c_name", "c_nationkey",
        F.when(F.col("c_custkey") % 10 == 3, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    merged = scd2_merge(
        prod, stag, cfg, "2024-06-01 00:00:00", key_strategy="two_pass"
    )

    # noop write, not count(): count() lets Catalyst prune every payload
    # column out of the merge, so the "merge" measured is an int-only
    # skeleton (132M rows "merged" in 2.2s at 8000x — r13). The noop
    # sink materializes full rows, like a real publish. The sanity row
    # count runs after it inside the timed unit — a pruned-skeleton
    # pass that scales the same way, so the exponent is unaffected.
    def run():
        merged.write.format("noop").mode("overwrite").save()
        return merged.count()

    return run


def minhash_lsh(spark, mult):
    from implementing_scds_in_hive_spark.operators.dedup import (
        portable_minhash_lsh_pairs,
    )

    pairs = portable_minhash_lsh_pairs(
        _docs(spark, mult), n=3, num_perm=24, bands=8, threshold=0.5
    )
    return lambda: pairs.count()


def ivf_topk_probe(spark, mult):
    from implementing_scds_in_hive_spark.operators.similarity import ivf_topk

    e = _embeddings(spark, mult)
    # centroid COUNT pinned to the 1x corpus (vec_id < 10M keeps only
    # original ids): a centroid set growing with the corpus would make
    # the assign stage quadratic by construction
    cent = e.where(
        (F.col("vec_id") % 25 == 3) & (F.col("vec_id") < 10_000_000)
    ).select(F.col("vec_id").alias("centroid_id"), "embedding")
    # query set pinned to the 1x corpus as well — the probe must
    # measure corpus growth at FIXED query load
    q = e.where(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    ).limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    top = ivf_topk(e, q, cent, k=8, nprobe=3)
    return lambda: top.count()


def pack_seq(spark, mult):
    from implementing_scds_in_hive_spark.functions.chunking import (
        pack_sequences,
    )

    packed = pack_sequences(_docs(spark, mult), seq_len=512)
    return lambda: packed.count()


def main(mult: int, only: set[str] | None = None) -> None:
    spark = get_spark("scale-exponent-smoke")
    out = {}
    for name, builder in [
        ("scd2_merge", flagship_merge),
        ("minhash_lsh", minhash_lsh),
        ("ivf_topk", ivf_topk_probe),
        ("pack_sequences", pack_seq),
    ]:
        if only and name not in only:
            continue
        t1 = t1b = None
        for m, key in [(1, "t_1x"), (mult, f"t_{mult}x")]:
            # warm on a THROWAWAY build (JVM/codegen/scan-cache warmth),
            # then time a FRESH builder call END-TO-END: reusing the
            # warm DataFrame would let localCheckpoint/persisted
            # intermediates materialized by the warm pass satisfy the
            # timed pass, and eager pins (_pin_reused) materialize at
            # plan-CONSTRUCTION time inside the builder — so the timed
            # unit must be builder()+action, not just the action, or
            # only post-pin tail stages get measured and the exponent
            # is understated (r12 ADVICE). Identical plan shape -> the
            # codegen cache still carries the warmth we want to keep.
            builder(spark, m)()  # warm
            t, n = _timed(lambda b=builder, mm=m: b(spark, mm)())
            out.setdefault(name, {})[key] = t
            out[name][f"rows_{m}x"] = n
            if m == 1:
                t1 = t
            else:
                t1b = t
        out[name]["exponent"] = round(
            math.log(max(t1b, 1e-3) / max(t1, 1e-3)) / math.log(mult), 2
        )
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    # usage: scale_exponent_smoke.py [mult] [tier ...]
    # e.g. `... 100 scd2_merge pack_sequences` runs the overhead-bound
    # tiers at 100x replication, where t_100x/t_1x >= 5x makes the
    # exponent meaningful (VERDICT r12 next-round #7)
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    main(mult, set(sys.argv[2:]) or None)
