"""Copy-on-write / merge-on-read scale smoke (VERDICT r6 #1 and r7 #1
'done' criteria): a planted ~1% change rate against a 2M-row snapshot
dimension, measuring write volume and wall time for the file-granular
CoW path, the deletion-vector MoR path, and the full-rewrite publish.

Two batch shapes, because CoW file-granularity only pays when changes
concentrate in few files:

* clustered — the staged keys are one contiguous 1% key range (the
  realistic shape: monotonic business keys, recent-entity updates,
  partition-aligned backfills). Expect files_rewritten << files_total.
* scattered — the same batch size spread uniformly over the key space
  (the COMMON dimension-maintenance shape: random customers change). At
  1% density every file contains a touched key, so CoW honestly
  degrades to a full rewrite plus bookkeeping — this was r7's one
  measured scale gap. The r8 merge-on-read tier (scd2_merge_mor) is the
  answer: it writes merge output + per-file key tombstones and drops
  NOTHING, so its write volume is O(batch) regardless of scatter; reads
  overlay the vectors, and compact_deletes folds them away on the
  maintenance cadence (also timed here).

Usage: python scripts/cow_scale_smoke.py [n_rows] [n_files]
Results recorded in PLANS.md (copy-on-write / merge-on-read section).
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import os

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    assign_surrogate_keys,
    scd2_merge,
    scd2_merge_cow,
    scd2_merge_mor,
)
from implementing_scds_in_hive_spark.sources.sinks import compact_deletes
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.snapshot import (
    read_snapshot,
    read_table,
    write_snapshot,
)

CFG = SCDConfig(
    key="k",
    type2_cols=("seg", "bal"),
    type1_cols=("name",),
    surrogate_col="sk",
    end_of_time="2260-12-31 23:59:59",
)
AS_OF = "2024-06-01 00:00:00"


def build_dim(spark, n):
    return spark.range(n).select(
        F.lit(None).cast("long").alias("sk"),
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") % 7).cast("string").alias("seg"),
        (F.col("id") % 1000).cast("double").alias("bal"),
        F.lit(1).alias("scd_version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit(CFG.end_of_time).cast("timestamp").alias("scd_end_date"),
        F.lit(True).alias("scd_active"),
    )


def batch_from(dim, pred):
    return dim.where(pred).select(
        "k", "name", F.concat(F.lit("S"), F.col("seg")).alias("seg"), "bal"
    )


def main(n: int, n_files: int) -> None:
    spark = get_spark("cow-scale-smoke")
    dim = assign_surrogate_keys(build_dim(spark, n), CFG, strategy="hash")
    out = {"n_rows": n, "n_files": n_files}
    pct = n // 100

    for shape, pred in [
        ("clustered", (F.col("k") >= n - pct)),
        ("scattered", (F.col("k") % 100 == 37)),
    ]:
        root = tempfile.mkdtemp(prefix=f"cow_smoke_{shape}_")
        shutil.rmtree(root)
        t0 = time.time()
        write_snapshot(
            dim.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
            root,
            stats_cols=["k"],
        )
        t_publish = time.time() - t0
        batch = batch_from(dim, pred)

        t0 = time.time()
        rep = scd2_merge_cow(spark, root, batch, CFG, AS_OF, key_strategy="hash")
        t_cow = time.time() - t0
        rep["rows"] = read_table(spark, root).count()

        t0 = time.time()
        full = scd2_merge(
            read_snapshot(spark, root, version=1),
            batch,
            CFG,
            AS_OF,
            key_strategy="hash",
            broadcast_staging=True,
        )
        froot = root + "_full"
        write_snapshot(
            full.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
            froot,
            stats_cols=["k"],
        )
        t_full = time.time() - t0

        n_expected = n + batch.count()  # every change is Type-2 here
        assert rep["rows"] == n_expected, (rep["rows"], n_expected)

        # write amplification in BYTES (what a 100 TB cluster pays):
        # staged bytes of the CoW commit vs the full-rewrite commit
        from implementing_scds_in_hive_spark.sources.snapshot import (
            load_manifest,
        )

        def _bytes(rt, v, only_new=None):
            mm = load_manifest(rt, v)
            fs = mm["files"] if only_new is None else [
                f for f in mm["files"] if f not in only_new
            ]
            return sum(os.path.getsize(os.path.join(rt, f)) for f in fs)

        m1_files = set(load_manifest(root, 1)["files"])
        out[shape] = {
            "publish_s": round(t_publish, 2),
            "cow_merge_s": round(t_cow, 2),
            "full_rewrite_s": round(t_full, 2),
            "files_total": rep["files_total"],
            "files_candidates": rep["files_candidates"],
            "files_rewritten": rep["files_rewritten"],
            "mb_written_cow": round(_bytes(root, 2, m1_files) / 1e6, 1),
            "mb_written_full": round(_bytes(froot, 1) / 1e6, 1),
        }

        # merge-on-read on a fresh copy of v1: write volume must be
        # O(batch) REGARDLESS of scatter, the r8 tier's whole point
        mroot = root + "_mor"
        write_snapshot(
            dim.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
            mroot,
            stats_cols=["k"],
        )
        t0 = time.time()
        rep_mor = scd2_merge_mor(
            spark, mroot, batch, CFG, AS_OF, key_strategy="hash"
        )
        t_mor = time.time() - t0
        t0 = time.time()
        n_mor = read_table(spark, mroot).count()
        t_read_overlay = time.time() - t0
        assert n_mor == n_expected, (n_mor, n_expected)
        mm = load_manifest(mroot, 2)
        vec_files = {r for rels in mm.get("deletes", {}).values() for r in rels}
        mb_mor = sum(
            os.path.getsize(os.path.join(mroot, f))
            for f in (set(mm["files"]) - set(load_manifest(mroot, 1)["files"]))
            | vec_files
        )
        t0 = time.time()
        fold = compact_deletes(spark, mroot)
        t_fold = time.time() - t0
        assert read_table(spark, mroot).count() == n_expected
        out[shape].update(
            {
                "mor_merge_s": round(t_mor, 2),
                "mor_files_tombstoned": rep_mor["files_tombstoned"],
                "mor_tombstones": rep_mor["tombstones"],
                "mb_written_mor": round(mb_mor / 1e6, 1),
                "mor_read_overlay_s": round(t_read_overlay, 2),
                "mor_fold_s": round(t_fold, 2),
                "mor_fold_files_written": fold["files_written"],
            }
        )
        for r in (root, froot, mroot):
            shutil.rmtree(r, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(n, nf)
