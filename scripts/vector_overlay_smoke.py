"""Deletion-vector read bill vs ACCUMULATED VECTOR FILES (VERDICT r8
next-round #4): the bench already pins the worst-case overlay at a fixed
vectored FRACTION (every file vectored by one commit); what it does not
show is how the bill grows with the NUMBER of distinct vector files many
small MoR commits accumulate before the fold fires — the 100 TB
dimension-maintenance steady state, where each small commit's tombstones
land in their own vector file.

Protocol note first (it bounds the experiment): a commit's staged vector
batch REPLACES the prior vectors of every file it re-touches (fold-
forward), so repeated commits over the SAME files consolidate into the
newest batch's bins — vector files only accumulate across commits
touching DISJOINT file sets, and each data file references exactly its
latest batch's bins. Hence #live vector files <= #vectored data files,
and the existing ``maintain_table(max_vectored_fraction=f)`` policy
bounds BOTH the vectored fraction and the vector-file count by f *
n_files. The open question is the SLOPE: what one more vector file costs
a full-table read (per-group plan overhead in the overlay), i.e. whether
a separate ``max_vector_files`` trigger would bind before the fraction
trigger does.

Experiment: 2M rows / 64 clustered files.

* ``clean``      — no vectors (baseline)
* ``N=k`` series — k disjoint small MoR DELETEs (each stats-pruned to
  ~64/k files, own vector file); read timed at k in {1, 4, 16, 64}
* ``one-commit`` — the SAME final vectored state (all 64 files) written
  by ONE commit (1 vector file): isolates the per-vector-file cost from
  the vectored-fraction cost at identical fraction + tombstone count
* ``folded``     — after compact_deletes (the remedy's cost is timed)

Median-of-3 full-scan reads. Results + verdict recorded in PLANS.md
("Vector-overlay bill vs vector-file count").

Usage: python scripts/vector_overlay_smoke.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.operators.dml import delete_where  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402
from implementing_scds_in_hive_spark.sources.sinks import (  # noqa: E402
    compact_deletes,
    consolidate_vectors,
)
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    latest_version,
    load_manifest,
    read_table,
    write_snapshot,
)

N_ROWS = 2_000_000
N_FILES = 64


def timed_read(spark, root) -> float:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        read_table(spark, root).selectExpr(
            "count(*) AS n", "sum(v) AS s"
        ).collect()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def fresh_table(spark, root):
    shutil.rmtree(root, ignore_errors=True)
    df = spark.range(N_ROWS).selectExpr(
        "id", "CAST(id % 1000 AS DOUBLE) AS v", "id % 97 AS tag"
    )
    write_snapshot(
        df.repartitionByRange(N_FILES, "id").sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )


def vector_file_count(root) -> int:
    m = load_manifest(root, latest_version(root))
    return len({r for rels in m.get("deletes", {}).values() for r in rels})


def main():
    spark = get_spark("vector-overlay-smoke")
    base = os.path.join(tempfile.gettempdir(), "vector_overlay_smoke")
    root = os.path.join(base, "t")
    results: dict[str, tuple[float, int, int]] = {}

    fresh_table(spark, root)
    results["clean"] = (timed_read(spark, root), 0, 0)

    # k disjoint slices -> k commits, each its own vector file
    slice_w = N_ROWS // N_FILES
    checkpoints = {1, 4, 16, 64}
    for i in range(N_FILES):
        lo, hi = i * slice_w, (i + 1) * slice_w
        # ~0.4% of the slice's rows, scattered inside it
        delete_where(
            spark,
            root,
            f"id >= {lo} AND id < {hi} AND id % 256 = 0",
            tier="mor",
            prune={"id": (lo, hi - 1)},
        )
        k = i + 1
        if k in checkpoints:
            m = load_manifest(root, latest_version(root))
            results[f"commits={k}"] = (
                timed_read(spark, root),
                vector_file_count(root),
                len(m.get("deletes", {})),
            )

    # the CHEAP remedy first (r10): vectors-only consolidation — the
    # 64-list state collapses to ONE vector file with every data file
    # carried by reference; the read bill should drop to the one-commit
    # level (the bill was plan branches, not tombstone volume)
    t0 = time.perf_counter()
    crep = consolidate_vectors(spark, root)
    consolidate_s = time.perf_counter() - t0
    m = load_manifest(root, latest_version(root))
    results["consolidated"] = (
        timed_read(spark, root),
        vector_file_count(root),
        len(m.get("deletes", {})),
    )

    # the data-rewrite remedy: one fold, timed (runs on the
    # consolidated state; retires the vectors entirely)
    t0 = time.perf_counter()
    rep = compact_deletes(spark, root)
    fold_s = time.perf_counter() - t0
    results["folded"] = (timed_read(spark, root), 0, 0)

    # same final fraction (64/64 files) via ONE commit -> 1 vector file
    root2 = os.path.join(base, "t2")
    fresh_table(spark, root2)
    delete_where(spark, root2, "id % 256 = 0", tier="mor")
    m2 = load_manifest(root2, latest_version(root2))
    results["one-commit"] = (
        timed_read(spark, root2),
        vector_file_count(root2),
        len(m2.get("deletes", {})),
    )

    clean = results["clean"][0]
    print(f"\n{'state':<12} {'read_s':>8} {'vs clean':>9} "
          f"{'vec_files':>9} {'vectored':>9}")
    for k, (s, nvf, nvd) in results.items():
        print(f"{k:<12} {s:>8.3f} {s / clean:>8.2f}x {nvf:>9} {nvd:>9}")
    print(
        f"consolidate: {consolidate_s:.3f}s "
        f"{crep['vector_files_before']}->{crep['vector_files_after']} "
        f"vector files (data untouched); "
        f"fold: {fold_s:.3f}s folded={rep['files_folded']} files"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
