"""Column-mapping read/write overhead at bench scale (r10).

PLANS claims the mapping costs one projection node on reads and one
driver-side dict translation on writes — this measures it instead of
asserting it: the same full-scan aggregate and the same CoW UPDATE are
timed on an unmapped table and again after a RENAME COLUMN activates
the mapping (identical bytes, identical plan shape except the final
rename projection).

Usage: python scripts/column_mapping_smoke.py  [SF_DIR]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.operators.dml import update_where  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    read_table,
    rename_column_commit,
    write_snapshot,
)


def timed(fn, runs=5) -> float:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("column-mapping-smoke")
    base_dir = os.path.join(tempfile.gettempdir(), "colmap_smoke")
    shutil.rmtree(base_dir, ignore_errors=True)
    root = os.path.join(base_dir, "t")

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_snapshot(
        base.repartitionByRange(16, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        root,
        stats_cols=["o_orderkey"],
    )

    def scan(col):
        read_table(spark, root).selectExpr(
            "count(*) AS n", f"sum({col}) AS s"
        ).collect()

    plain_read = timed(lambda: scan("o_totalprice"))
    plain_update = timed(
        lambda: update_where(
            spark, root, {"o_totalprice": "o_totalprice * 1.0"},
            "o_orderkey <= 1000", tier="cow",
        ), runs=3,
    )

    rename_column_commit(root, "o_totalprice", "price")
    mapped_read = timed(lambda: scan("price"))
    mapped_update = timed(
        lambda: update_where(
            spark, root, {"price": "price * 1.0"},
            "o_orderkey <= 1000", tier="cow",
        ), runs=3,
    )

    print(f"read  unmapped {plain_read:.3f}s  mapped {mapped_read:.3f}s  "
          f"ratio {mapped_read / plain_read:.2f}x")
    print(f"cow-update  unmapped {plain_update:.3f}s  mapped "
          f"{mapped_update:.3f}s  ratio {mapped_update / plain_update:.2f}x")
    shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
