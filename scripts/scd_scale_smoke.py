"""SCD2 merge scale smoke: synthetic 10M-row dimension, 1M-row staging.

The bench fixture (sf0.1 customer) is 15k rows — three orders of
magnitude below anything interesting. This smoke synthesizes a
dimension at [n] rows (default 10M) with a 10% staged delta (half
Type-2 changes, ~5% brand-new keys) and times the merge end-to-end
(count of the result) for the broadcast plan under each surrogate-key
strategy, plus the full_outer plan for reference. Checks the result
cardinality arithmetic exactly.

Usage: python scripts/scd_scale_smoke.py [n_rows]
Results recorded in PLANS.md (flagship section).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge
from implementing_scds_in_hive_spark.session import get_spark

CFG = SCDConfig(
    key="k",
    type2_cols=("seg", "bal"),
    type1_cols=("name",),
    surrogate_col="sk",
    end_of_time="2260-12-31 23:59:59",
)
AS_OF = "2024-06-01 00:00:00"


def main(n: int) -> None:
    spark = get_spark("scd-scale-smoke")
    k = F.col("id")
    prod = spark.range(n).select(
        F.lit(None).cast("long").alias("sk"),
        k.alias("k"),
        F.concat(F.lit("name#"), k.cast("string")).alias("name"),
        (k % 7).cast("string").alias("seg"),
        (k % 1000).cast("double").alias("bal"),
        F.lit(1).alias("scd_version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit(CFG.end_of_time).cast("timestamp").alias("scd_end_date"),
        F.lit(True).alias("scd_active"),
    )
    # staging: keys 0..n/10 (10% of keys staged); half get a Type-2 bal
    # change, the rest are no-ops; plus n/20 brand-new keys above n.
    m = n // 10
    stg_old = spark.range(m).select(
        k.alias("k"),
        F.concat(F.lit("name#"), k.cast("string")).alias("name"),
        (k % 7).cast("string").alias("seg"),
        F.when(k % 2 == 0, (k % 1000) + 5000.0)
        .otherwise((k % 1000).cast("double"))
        .alias("bal"),
    )
    stg_new = spark.range(n, n + n // 20).select(
        k.alias("k"),
        F.concat(F.lit("new#"), k.cast("string")).alias("name"),
        F.lit("NEW").alias("seg"),
        F.lit(0.0).alias("bal"),
    )
    staging = stg_old.unionByName(stg_new)

    # changed keys (m/2) add one row each; new keys add n/20 rows
    expect = n + m // 2 + n // 20
    report = {"n_prod": n, "n_staging": m + n // 20, "expected_rows": expect}

    for plan, strategy in (
        ("broadcast", "hash"),
        ("broadcast", "two_pass"),
        ("full_outer", "hash"),
    ):
        t0 = time.time()
        got = scd2_merge(
            prod, staging, CFG, AS_OF, plan=plan, key_strategy=strategy
        ).count()
        dt = round(time.time() - t0, 2)
        assert got == expect, (plan, strategy, got, expect)
        report[f"{plan}/{strategy}_sec"] = dt
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
