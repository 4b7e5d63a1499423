"""Snapshot table tour: the manifest commit protocol end to end.

The reference's pain point was plain-Hive INSERT OVERWRITE having no
isolation (its README laments readers seeing partial state). This
walkthrough drives the r6 replacement — sources/snapshot.py — through
one lifecycle: publish with CHECK constraints, a rejected bad publish,
time travel, the I/U/D change feed and signed Z-set deltas between
versions, a follow-the-table consumer loop maintaining a rollup, and
vacuum-based retention. Prints every intermediate table.

Run: python examples/snapshot_table_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.snapshot import (
    ConstraintViolationError,
    changes_since,
    list_versions,
    read_snapshot,
    read_table,
    snapshot_changes,
    snapshot_deltas,
    vacuum,
    write_snapshot,
)


def main() -> None:
    spark = get_spark("snapshot-tour")
    root = os.path.join(tempfile.mkdtemp(prefix="snap_tour_"), "accounts")
    checks = {"balance_non_negative": "balance >= 0", "owner_set": "owner IS NOT NULL"}

    def df(rows):
        return spark.createDataFrame(rows, "acct long, owner string, balance double")

    print("== v1: initial publish (constraints enforced) ==")
    write_snapshot(df([(1, "ada", 100.0), (2, "bob", 50.0), (3, "cy", 75.0)]),
                   root, constraints=checks)
    read_table(spark, root).orderBy("acct").show()

    print("== a violating publish is rejected atomically ==")
    try:
        write_snapshot(df([(1, "ada", -5.0), (4, None, 10.0)]), root,
                       constraints=checks)
    except ConstraintViolationError as e:
        print("rejected:", e)
    print("table unchanged, still version", list_versions(root)[-1])

    print("== v2: update bob, delete cy, insert dee ==")
    write_snapshot(df([(1, "ada", 100.0), (2, "bob", 80.0), (4, "dee", 20.0)]),
                   root, constraints=checks)

    print("== time travel ==")
    read_snapshot(spark, root, version=1).orderBy("acct").show()

    print("== I/U/D change feed v1 -> v2 ==")
    snapshot_changes(spark, root, 1, 2, ["acct"]).orderBy("acct").show()

    print("== signed Z-set deltas (feeds incremental aggregates) ==")
    snapshot_deltas(spark, root, 1, 2, ["acct"]).orderBy("acct", "__w").show()

    print("== follow-the-table consumer (poll loop with a watermark) ==")
    watermark = None
    batch, watermark = changes_since(spark, root, watermark, ["acct"])
    print("first poll sees the whole table as inserts:")
    batch.orderBy("acct").show()
    batch, watermark = changes_since(spark, root, watermark, ["acct"])
    print("idle poll:", batch, "watermark stays", watermark)

    print("== retention ==")
    write_snapshot(df([(1, "ada", 101.0)]), root)
    print("versions before vacuum:", list_versions(root))
    print(vacuum(root, keep_last=1, grace_seconds=0.0))  # demo: reclaim now
    print("versions after:", list_versions(root))
    read_table(spark, root).show()

    shutil.rmtree(os.path.dirname(root))


if __name__ == "__main__":
    main()
