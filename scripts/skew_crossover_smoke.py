"""Hot-key dedupe crossover measurement (VERDICT r12 next-round #2).

At the r12 bench shape (150 hot keys x 800 redeliveries, 32 threads)
the window dedupe ties the max_by dedupe: 800 rows per hot key is far
below what saturates one task, and the merge downstream dominates. The
max_by tier exists for the pathological CDC shape — FEW entities
redelivered very deep — so this smoke grows the redelivery depth at a
fixed ~constant total row count and reports both strategies' end-to-end
(dedupe + merge) wall time per depth, to locate the crossover depth
where the map-side collapse measurably wins on 32 threads.

Shape per depth d: 8 hot keys x d redeliveries + every key x 8 (tail),
staged to parquet untimed; each timed run reads the staged parquet so
the two strategies scan identical bytes.

Usage: python scripts/skew_crossover_smoke.py [depth ...]
Run on a QUIET machine — a concurrent suite doubles timings.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    dedupe_staging,
    scd2_merge,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from implementing_scds_in_hive_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
N_HOT = 8
TAIL_COPIES = 8


def stage(spark, depth: int, root: str) -> None:
    base = customer_staging(spark, SF_DIR)
    hot_keys = [r["c_custkey"] for r in
                base.select("c_custkey").orderBy("c_custkey")
                .limit(N_HOT).collect()]
    normal = base.withColumn("__copies", F.lit(TAIL_COPIES))
    hot = base.where(F.col("c_custkey").isin(hot_keys)).withColumn(
        "__copies", F.lit(depth - TAIL_COPIES)
    )
    skewed = (
        normal.unionByName(hot)
        .withColumn("__seq", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
        .withColumn(
            "__seq",
            F.col("__seq").cast("long") * 100_000_000 + F.col("c_custkey"),
        )
    )
    # spread each key's redeliveries across partitions (hash of the
    # unique __seq): the real CDC shape — a hot entity's duplicates
    # arrive scattered over many micro-batches/files, NOT co-located.
    # Without this the explode leaves all copies in one input split and
    # the window path never pays its single-reducer toll.
    skewed.repartition(64, "__seq").write.mode("overwrite").parquet(root)


def timed_merge(spark, root: str, strategy: str, *, merge: bool = True) -> float:
    t0 = time.time()
    stg = spark.read.parquet(root)
    staged = dedupe_staging(
        stg, CUSTOMER_CFG, order_by=["__seq"], strategy=strategy
    ).drop("__seq")
    if merge:
        staged = scd2_merge(
            customer_production(spark, SF_DIR), staged, CUSTOMER_CFG, AS_OF,
            broadcast_staging=True, key_strategy="two_pass",
        )
    staged.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main(depths) -> None:
    import tempfile

    spark = get_spark("skew-crossover")
    out = {}
    for depth in depths:
        root = tempfile.mkdtemp(prefix=f"skew_{depth}_")
        stage(spark, depth, root)
        n_rows = spark.read.parquet(root).count()
        rec = {"rows": n_rows}
        for strategy in ("row_number", "max_by"):
            for merge in (False, True):
                tag = strategy + ("" if merge else "_dedupe_only")
                timed_merge(spark, root, strategy, merge=merge)  # warm
                runs = sorted(
                    timed_merge(spark, root, strategy, merge=merge)
                    for _ in range(3)
                )
                rec[tag] = runs[1]
                rec[f"{tag}_spread"] = [runs[0], runs[-1]]
        rec["maxby_wins"] = rec["max_by"] < rec["row_number"]
        rec["maxby_wins_dedupe_only"] = (
            rec["max_by_dedupe_only"] < rec["row_number_dedupe_only"]
        )
        # r14: strategy="auto" end-to-end (probe included) — the routed
        # run must land at the winner's time plus at most the probe
        timed_merge(spark, root, "auto", merge=False)  # warm
        runs = sorted(
            timed_merge(spark, root, "auto", merge=False) for _ in range(3)
        )
        rec["auto_dedupe_only"] = runs[1]
        rec["auto_dedupe_only_spread"] = [runs[0], runs[-1]]
        out[str(depth)] = rec
        print(f"# depth {depth}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    depths = [int(a) for a in sys.argv[1:]] or [800, 8_000, 40_000, 120_000]
    main(depths)
