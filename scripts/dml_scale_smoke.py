"""Generic-DML scale smoke (operators/dml.py): write volume and wall
time for DELETE WHERE / UPDATE SET over a 2M-row snapshot table, CoW
vs MoR tier, on the two predicate shapes that matter:

* range     — a contiguous 1% key slice (`k BETWEEN lo AND hi`): the
  stats prune narrows candidates driver-side, CoW rewrites only the
  prefix of files the slice lives in. Expect files_touched ~ 1/64.
* scattered — the same 1% selectivity spread uniformly (`k % 100 = 7`):
  every file contains matches, CoW degrades to a full rewrite, and the
  MoR tier's tombstones keep the write bill O(matched rows).

The MoR rows run in BOTH vector formats: positional (default —
(__file, __pos), two narrow columns whatever the table width) and
legacy full-row (the whole tuple per deleted row). The interesting
numbers are MoR-vs-CoW bytes at the same selectivity (the tier wins by
~the table/batch ratio) and pos-vs-row bytes (the positional constant
factor).

Usage: python scripts/dml_scale_smoke.py [n_rows] [n_files]
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

from implementing_scds_in_hive_spark.operators.dml import (
    delete_where,
    update_where,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    load_manifest,
    read_table,
    write_snapshot,
)


def table_bytes(root, version):
    m = load_manifest(root, version)
    files = list(m["files"])
    files += [r for rels in m.get("deletes", {}).values() for r in rels]
    return sum(os.path.getsize(os.path.join(root, f)) for f in set(files))


def written_bytes(root, v_before, v_after):
    """Bytes of NEW files (data + vectors) the commit chain added."""
    before = load_manifest(root, v_before)
    prior = set(before["files"]) | {
        r for rels in before.get("deletes", {}).values() for r in rels
    }
    after = load_manifest(root, v_after)
    new = (
        set(after["files"])
        | {r for rels in after.get("deletes", {}).values() for r in rels}
    ) - prior
    return sum(os.path.getsize(os.path.join(root, f)) for f in new)


def build(spark, root, n_rows, n_files):
    shutil.rmtree(root, ignore_errors=True)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("val"),
            F.concat(F.lit("row-"), F.col("id")).alias("payload"),
            (F.col("id") % 5).cast("int").alias("bucket"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )
    write_snapshot(df, root, stats_cols=["k"])


def run_case(spark, root, n_rows, n_files, label, op, predicate, tier, prune,
             vector_format="pos"):
    build(spark, root, n_rows, n_files)
    v0 = latest_version(root)
    t0 = time.time()
    if op == "delete":
        rep = delete_where(spark, root, predicate, tier=tier, prune=prune,
                           vector_format=vector_format)
    else:
        rep = update_where(
            spark, root, {"val": "val + 1.0"}, predicate, tier=tier,
            prune=prune, vector_format=vector_format,
        )
    wall = time.time() - t0
    out = {
        "case": label,
        "op": op,
        "tier": rep["tier"],
        "vectors": vector_format if rep["tier"] == "mor" else None,
        "files_total": rep["files_total"],
        "files_candidates": rep["files_candidates"],
        "files_touched": rep["files_touched"],
        "rows_matched": rep["rows_matched"],
        "mb_written": round(written_bytes(root, v0, rep["version"]) / 1e6, 2),
        "sec": round(wall, 2),
    }
    # row-count sanity so the smoke can't silently measure a wrong table
    n = read_table(spark, root).count()
    out["rows_after"] = n
    return out


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("dml-scale-smoke")
    root = os.path.join(tempfile.gettempdir(), f"dml_smoke_{os.getpid()}")
    lo, hi = n_rows // 2, n_rows // 2 + n_rows // 100 - 1
    range_pred = f"k BETWEEN {lo} AND {hi}"
    range_prune = {"k": (lo, hi)}
    scatter_pred = "k % 100 = 7"
    base_mb = None
    results = []
    for label, pred, prune in (
        ("range", range_pred, range_prune),
        ("scattered", scatter_pred, None),
    ):
        for op in ("delete", "update"):
            for tier, fmt in (
                ("cow", "pos"), ("mor", "pos"), ("mor", "row")
            ):
                r = run_case(
                    spark, root, n_rows, n_files, label, op, pred, tier,
                    prune, vector_format=fmt,
                )
                if base_mb is None:
                    base_mb = round(table_bytes(root, 1) / 1e6, 2)
                results.append(r)
                print(json.dumps(r))
    print(json.dumps({"table_mb": base_mb, "n_rows": n_rows,
                      "n_files": n_files}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
