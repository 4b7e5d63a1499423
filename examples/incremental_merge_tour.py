"""Incremental dimension maintenance tour: CoW, merge-on-read, and the
tier router.

The reference pipeline rewrites the whole dimension every merge
(SCD_script.txt:141's INSERT OVERWRITE). This walkthrough drives the
two incremental publish tiers end-to-end on a small clustered dimension
and prints what each commit actually wrote:

1. publish the dimension as a range-clustered snapshot table with
   per-file key stats;
2. a CLUSTERED staging batch routed by ``scd2_merge_incremental`` →
   the copy-on-write tier rewrites one file, carries the rest;
3. a SCATTERED batch → the merge-on-read tier writes only merge output
   plus per-file key tombstones (no data file dropped), and the read
   overlay hides the superseded rows;
4. the change feed between versions stays exact across the vector
   commit;
5. ``compact_deletes`` folds the vectors back into clean files, and
   ``maintain_table`` reports the clustering health before/after.

Run: python examples/incremental_merge_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from implementing_scds_in_hive_spark.operators.scd import (  # noqa: E402
    SCDConfig,
    assign_surrogate_keys,
    scd2_merge_incremental,
)
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402
from implementing_scds_in_hive_spark.sources.sinks import (  # noqa: E402
    clustering_overlap,
    compact_deletes,
)
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    load_manifest,
    read_table,
    snapshot_changes,
    write_snapshot,
)

CFG = SCDConfig(
    key="k", type2_cols=("seg",), type1_cols=("name",), surrogate_col="sk"
)


def build_dim(spark, n=1000):
    return spark.range(n).select(
        F.lit(None).cast("long").alias("sk"),
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") % 7).cast("string").alias("seg"),
        F.lit(1).alias("scd_version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit(CFG.end_of_time).cast("timestamp").alias("scd_end_date"),
        F.lit(True).alias("scd_active"),
    )


def describe(root, label):
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
    )

    m = load_manifest(root, latest_version(root))
    print(
        f"[{label}] v{m['version']} mode={m['mode']} files={len(m['files'])} "
        f"replaced={len(m.get('replaced', []))} "
        f"vectored={len(m.get('deletes', {}))}"
    )


def main():
    spark = get_spark("incremental-merge-tour", cpus=4)
    root = os.path.join(tempfile.mkdtemp(), "dim")

    dim = assign_surrogate_keys(build_dim(spark), CFG, strategy="hash")
    write_snapshot(
        dim.repartitionByRange(8, "k").sortWithinPartitions("k"),
        root,
        stats_cols=["k"],
    )
    describe(root, "publish")
    print("clustering overlap:", round(clustering_overlap(root, "k"), 3))

    # clustered batch: contiguous 2% key range -> router picks CoW
    clustered = dim.where(F.col("k").between(100, 119)).select(
        "k", "name", F.concat(F.lit("S"), F.col("seg")).alias("seg")
    )
    rep = scd2_merge_incremental(
        spark, root, clustered, CFG, datetime(2024, 2, 1)
    )
    print("clustered batch ->", rep)
    describe(root, "cow merge")

    # scattered batch: every 50th key -> router picks merge-on-read
    scattered = dim.where(F.col("k") % 50 == 7).select(
        "k", "name", F.concat(F.lit("T"), F.col("seg")).alias("seg")
    )
    rep = scd2_merge_incremental(
        spark, root, scattered, CFG, datetime(2024, 3, 1)
    )
    print("scattered batch ->", rep)
    describe(root, "mor merge")
    print("overlap after MoR:", round(clustering_overlap(root, "k"), 3))

    # the read overlay hides superseded rows: one key's history
    probe = read_table(spark, root).where(F.col("k") == 107)
    # k=107 sits in BOTH batches (107 ∈ [100,119] and 107 % 50 == 7):
    # its history spans a CoW rewrite AND a tombstone+insert
    print("history of k=107 (v1 closed by CoW, v2 closed by MoR, v3 active):")
    probe.orderBy("scd_version").show(truncate=False)

    # the change feed is exact across the vector commit
    ch = snapshot_changes(spark, root, 2, 3, ["k", "scd_version"])
    print("changes v2->v3:", ch.groupBy("op").count().collect())

    # fold the vectors away; clustering health is restored by compaction
    print("fold ->", compact_deletes(spark, root))
    describe(root, "after fold")
    n = read_table(spark, root).count()
    print("rows (1000 base + 20 + 20 new versions):", n)
    assert n == 1040
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()
