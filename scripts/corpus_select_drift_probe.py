"""Isolated corpus_select timing probe (VERDICT r12 residual watch:
1.148 (r11 driver) -> 1.273 (r12 driver) -> 1.467 (judge's quiet run)
— adjudicate drift vs container noise with isolated runs, the r10
method). Mirrors bench.py's measurement exactly (warm at sf0.001,
clearCache before each timed run, noop sink) but runs ONLY this query,
N times, in one otherwise-idle process.

Usage: python scripts/corpus_select_drift_probe.py [n_runs=7]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.plans.pipeline_ops import q_corpus_select
from implementing_scds_in_hive_spark.session import get_spark


def main(n: int) -> None:
    spark = get_spark("corpus-select-probe")
    q_corpus_select(spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()  # codegen warm
    runs = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.time()
        q_corpus_select(spark, "/root/testdata/sf0.1").write.format(
            "noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    runs_sorted = sorted(runs)
    print(json.dumps({
        "runs": runs, "median": runs_sorted[len(runs) // 2],
        "min": runs_sorted[0], "max": runs_sorted[-1],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
