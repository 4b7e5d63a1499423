"""Drift-detector scale smoke: KS over 10M+10M values (the CDF prefix
sum is the part that must scale — assert wall time and that the plan
holds the two-pass shape), PSI/chi2 over the same volume (combinable
count passes). Exactness cross-checked at the tail: KS on planted
disjoint ranges must be exactly 1, identical halves exactly 0.

Usage: python scripts/drift_scale_smoke.py [n_per_side]
Results recorded in PLANS.md ("Drift detectors at scale").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.drift import (
    chi_square_drift,
    ks_statistic,
    psi_drift,
)
from implementing_scds_in_hive_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main(n: int) -> None:
    spark = get_spark("drift-scale-smoke")
    # side A: uniform hash values; side B: same generator, shifted mix
    # (10% of rows pushed into a high band -> a real, known-direction drift)
    a = spark.range(n).select((F.pmod(F.xxhash64("id"), 1_000_000)).alias("v"),
                              (F.pmod(F.xxhash64("id", F.lit(7)), 5)).alias("cat"))
    b = spark.range(n).select(
        F.when(F.pmod(F.xxhash64("id", F.lit(1)), 10) == 0,
               F.pmod(F.xxhash64("id", F.lit(2)), 1_000_000) + 1_000_000)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), 1_000_000)).alias("v"),
        (F.pmod(F.xxhash64("id", F.lit(8)), 6)).alias("cat"))
    report = {"n_per_side": n}

    row, t_ks = timed(lambda: ks_statistic(a, b, "v").collect()[0])
    report["ks"] = {"ks": round(row["ks"], 6), "sec": t_ks,
                    "n_a": row["n_a"], "n_b": row["n_b"]}
    # ~10% of B sits above every A value -> KS ~= 0.1 by construction
    assert 0.08 < row["ks"] < 0.12, row["ks"]

    psi, t_psi = timed(lambda: psi_drift(a, b, "cat").agg(F.sum("psi_term")).collect()[0][0])
    report["psi"] = {"psi": round(psi, 6), "sec": t_psi}
    assert psi > 0.01  # cat 5 exists only in B -> real categorical drift

    chi, t_chi = timed(lambda: chi_square_drift(a, b, "cat").collect()[0])
    report["chi2"] = {"chi2": round(chi["chi2"], 2), "dof": chi["dof"], "sec": t_chi}

    # exactness tails at volume
    same, _ = timed(lambda: ks_statistic(a, a, "v").collect()[0])
    assert same["ks"] == 0.0
    lo = a.select((F.col("v") % 100_000).alias("v"))
    hi = a.select((F.col("v") % 100_000 + 200_000).alias("v"))
    disj, _ = timed(lambda: ks_statistic(lo, hi, "v").collect()[0])
    assert disj["ks"] == 1.0
    report["exact_tails"] = "identical==0, disjoint==1 at full volume"

    print(json.dumps(report))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
