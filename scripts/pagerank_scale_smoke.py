"""PageRank scale smoke: per-iteration cost on a 1M-edge power-law-ish
graph (hash-generated, no data files), with exact mass-conservation
asserts. The quantity that matters at 100 TB is the per-iteration
shape — one edges-sized join + combinable sum — and that iteration
cost stays flat (localCheckpoint keeps plan depth O(1), the dangling
aggregate is one scalar).

Usage: python scripts/pagerank_scale_smoke.py [n_edges]
Results recorded in PLANS.md ("PageRank at scale").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.graph import pagerank
from implementing_scds_in_hive_spark.session import get_spark


def main(n_edges: int) -> None:
    spark = get_spark("pagerank-scale-smoke")
    # skewed targets: dst ~ hash^3 concentration -> a few hub nodes with
    # huge in-degree (the shape real link graphs have)
    edges = (
        spark.range(n_edges)
        .select(
            (F.xxhash64("id") % 100_000).alias("src"),
            (
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))
                * F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100))
            ).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    n = edges.count()
    t0 = time.time()
    ranks = pagerank(edges, iterations=5)
    mass = ranks.agg(F.sum("pr")).collect()[0][0]
    wall = time.time() - t0
    top = ranks.orderBy(F.desc("pr")).limit(3).collect()
    assert abs(mass - 1.0) < 1e-9, mass
    print(json.dumps({
        "n_edges": n,
        "n_nodes": ranks.count(),
        "iterations": 5,
        "total_sec": round(wall, 2),
        "sec_per_iteration": round(wall / 5, 2),
        "mass": mass,
        "top3": [(r["node"], round(r["pr"], 6)) for r in top],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
