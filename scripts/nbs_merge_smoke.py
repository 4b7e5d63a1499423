"""NOT-MATCHED-BY-SOURCE merge scale smoke: the clause forces
full-candidate DISCOVERY (by-source rows can sit anywhere), but the
WRITE bill must stay O(affected rows) on the MoR tier — positional
tombstones + rewritten/inserted rows, no file dropped — vs the CoW
tier's rewrite of every touched file.

Shape: 2M-row / 64-file key-clustered table; source updates a 1%
scattered key slice; the NBS clauses delete a ~0.5% scattered value
band of unmatched rows and status-flag a further ~0.5%. Both tiers run
on fresh copies; row-identical results asserted against each other.

Usage: python scripts/nbs_merge_smoke.py [n_rows] [n_files]
Results recorded in PLANS.md (generic row-level DML section).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dml import merge_into
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    load_manifest,
    read_table,
    write_snapshot,
)


def build(spark, root, n_rows, n_files):
    shutil.rmtree(root, ignore_errors=True)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("val"),
            F.concat(F.lit("row-"), F.col("id")).alias("payload"),
            F.lit("live").alias("status"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )
    write_snapshot(df, root, stats_cols=["k"])


def written_bytes(root, v0, v1):
    def live(m):
        return set(m["files"]) | {
            r for rels in m.get("deletes", {}).values() for r in rels
        }

    new = live(load_manifest(root, v1)) - live(load_manifest(root, v0))
    return sum(os.path.getsize(os.path.join(root, f)) for f in new)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("nbs-merge-smoke")
    results = {}
    canon = None
    for tier in ("mor", "cow"):
        root = os.path.join(
            tempfile.gettempdir(), f"nbs_smoke_{tier}_{os.getpid()}"
        )
        build(spark, root, n_rows, n_files)
        src = (
            spark.range(n_rows)
            .where("id % 100 = 7")  # 1% scattered matched keys
            .select(F.col("id").alias("k"), F.lit(-5.0).alias("nv"))
        )
        v0 = latest_version(root)
        t0 = time.time()
        rep = merge_into(
            spark,
            root,
            src,
            ["k"],
            when_matched_update={"val": "s.nv"},
            when_not_matched_insert=None,
            # ~0.5% of unmatched rows each (val in [0,997))
            when_not_matched_by_source_delete="t.val < 5",
            when_not_matched_by_source_update={"status": "'flagged'"},
            not_matched_by_source_condition="t.val >= 992",
            tier=tier,
        )
        wall = time.time() - t0
        results[tier] = {
            "tier": rep["tier"],
            "files_candidates": rep["files_candidates"],
            "files_touched": rep["files_touched"],
            "rows_updated": rep["rows_updated"],
            "rows_deleted": rep["rows_deleted"],
            "mb_written": round(
                written_bytes(root, v0, rep["version"]) / 1e6, 2
            ),
            "sec": round(wall, 2),
        }
        t0 = time.time()
        got = read_table(spark, root)
        n = got.count()
        results[tier]["rows_after"] = n
        results[tier]["read_s"] = round(time.time() - t0, 2)
        agg = got.agg(
            F.sum("val").alias("sv"),
            F.sum(F.when(F.col("status") == "flagged", 1).otherwise(0)),
        ).first()
        sig = (n, round(float(agg[0]), 3), int(agg[1]))
        if canon is None:
            canon = sig
        else:
            assert sig == canon, f"tiers diverge: {sig} vs {canon}"
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"n_rows": n_rows, "n_files": n_files, **results}))


if __name__ == "__main__":
    main()
