"""Manifest scalability ceiling (VERDICT r7 next-round #6): the commit
log keeps ONE JSON manifest per version holding the full file list plus
per-file stats, parsed driver-side on every read — at 100 TB / ~1 GB
files that is ~10^5 entries. This script synthesizes manifests at
10^3..10^5 entries (realistic path lengths, min/max stats) and times
every driver-side operation a read/commit/vacuum pays:

* ``load_manifest``          — JSON parse (every read/commit)
* prune filter               — ``_survives_prune`` over ALL files (the
                               pruned-read path)
* commit carry               — the replace-mode carried-list rebuild
                               (set difference + stats filter)
* vacuum file sweep          — the file-granular os.walk over a real
                               on-disk tree of N empty files

Pure driver-side paths — no Spark session needed. Results + the
shard-or-not verdict recorded in PLANS.md ("Manifest ceiling").

Usage: python scripts/manifest_ceiling.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    _survives_prune,
    _sweep_replaced_files,
    load_manifest,
)


def synth_manifest(root: str, n: int) -> dict:
    dirs = [
        os.path.join("data", f"snap-{uuid.uuid4().hex}")
        for _ in range(max(1, n // 1000))  # ~1000 files per commit dir
    ]
    files, stats = [], {}
    per = max(1, n // len(dirs))
    width = 2_000_000  # keys per file at 2e11 rows / 1e5 files
    for i in range(n):
        d = dirs[min(i // per, len(dirs) - 1)]
        rel = os.path.join(
            d, f"part-{i % per:05d}-{uuid.uuid4().hex}-c000.snappy.parquet"
        )
        files.append(rel)
        stats[rel] = {"k": [i * width, (i + 1) * width - 1]}
    m = {
        "version": 7,
        "parent": 6,
        "mode": "overwrite",
        "snapshot_dirs": dirs,
        "files": files,
        "schema": json.dumps({"type": "struct", "fields": []}),
        "partition_by": [],
        "writer": uuid.uuid4().hex,
        "stats": stats,
        "cow_lineage": True,
    }
    mdir = os.path.join(root, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "v0000000007.json"), "w") as f:
        json.dump(m, f)
    return m


def _load_uncached(root):
    from implementing_scds_in_hive_spark.sources import snapshot as snap

    def run():
        snap._MANIFEST_CACHE.clear()
        return load_manifest(root, 7)

    return run


def time_ms(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def main() -> None:
    out = {}
    for n in (1_000, 10_000, 100_000):
        root = tempfile.mkdtemp(prefix=f"manifest_ceiling_{n}_")
        m = synth_manifest(root, n)
        probe = {"k": (n * 1_000_000, n * 1_000_000 + 10)}

        res = {
            "manifest_mb": round(
                os.path.getsize(
                    os.path.join(root, "_manifests", "v0000000007.json")
                )
                / 1e6,
                1,
            ),
            "load_ms": time_ms(_load_uncached(root)),
            "load_cached_ms": time_ms(lambda: load_manifest(root, 7)),
            "prune_all_files_ms": time_ms(
                lambda: [
                    f
                    for f in m["files"]
                    if _survives_prune(m["stats"].get(f, {}), probe)
                ]
            ),
        }

        # replace-mode carry: drop 1% of files, rebuild carried list +
        # stats (the dict work commit() does per replace)
        drop = set(m["files"][:: 100])

        def carry():
            carried = [f for f in m["files"] if f not in drop]
            _ = {
                f: s for f, s in m["stats"].items() if f not in drop
            }
            return carried

        res["replace_carry_ms"] = time_ms(carry)

        # vacuum file sweep over a REAL tree of n empty files
        for rel in m["files"]:
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            open(p, "w").close()
        referenced_dirs = set(m["snapshot_dirs"])
        referenced_files = set(m["files"])
        res["vacuum_walk_ms"] = time_ms(
            lambda: _sweep_replaced_files(
                root, referenced_dirs, referenced_files, 600.0, time.time()
            ),
            reps=1,
        )
        out[n] = res
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
