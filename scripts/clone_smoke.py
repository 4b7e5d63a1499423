"""SHALLOW CLONE cost-scaling smoke (r11): demonstrate that clone time
is O(manifest + vector bytes), NOT O(data bytes) — the property that
makes a zero-copy clone of a 100 TB table a metadata operation.

Method: publish the same row count at two data widths (a padded string
column multiplies the byte size ~8x while the manifest stays the same
size), clone both, and compare wall times; then add deletion-vector
debt and show clone time scales with VECTOR bytes while the CTAS-style
deep copy scales with DATA bytes.

Usage: python scripts/clone_smoke.py [rows]
Prints one human-readable block; numbers land in PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.operators.dml import delete_where  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    clone_table,
    read_snapshot,
    write_snapshot,
)


def _table_bytes(root: str) -> int:
    total = 0
    for dp, _d, fs in os.walk(root):
        for f in fs:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("clone-smoke")
    base = os.path.join(tempfile.gettempdir(), f"clone_smoke_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    results = {}
    for label, pad in (("narrow", 0), ("wide", 256)):
        root = os.path.join(base, f"src_{label}")
        df = spark.range(rows).selectExpr(
            "id",
            "id * 2 AS v",
            # per-row-unique padding so parquet cannot RLE it away
            *(
                [f"repeat(md5(CAST(id AS STRING)), {pad // 32}) AS pad"]
                if pad
                else []
            ),
        )
        write_snapshot(
            df.repartitionByRange(16, "id").sortWithinPartitions("id"),
            root,
            stats_cols=["id"],
        )
        dst = os.path.join(base, f"clone_{label}")
        dt = _timed(lambda: clone_table(root, dst))
        results[label] = (dt, _table_bytes(root), _table_bytes(dst))
    n_dt, n_src, n_clone = results["narrow"]
    w_dt, w_src, w_clone = results["wide"]
    print(
        f"clone narrow ({n_src/1e6:.1f} MB data): {n_dt*1e3:.1f} ms, "
        f"clone dir {n_clone/1e3:.1f} KB"
    )
    print(
        f"clone wide   ({w_src/1e6:.1f} MB data): {w_dt*1e3:.1f} ms, "
        f"clone dir {w_clone/1e3:.1f} KB"
    )
    print(
        f"data grew {w_src/max(1,n_src):.1f}x -> clone time ratio "
        f"{w_dt/max(1e-9,n_dt):.2f}x (O(manifest), not O(data))"
    )

    # vector-debt leg: MoR deletes on the wide source, clone again
    root = os.path.join(base, "src_wide")
    for k in range(6):
        lo = k * (rows // 8)
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 50}", tier="mor"
        )
    dst2 = os.path.join(base, "clone_wide_vectored")
    v_dt = _timed(lambda: clone_table(root, dst2))
    # deep copy (CTAS shape) for contrast: materializes every byte
    dst3 = os.path.join(base, "deep_copy")
    d_dt = _timed(
        lambda: write_snapshot(read_snapshot(spark, root), dst3)
    )
    print(
        f"clone wide+vectors: {v_dt*1e3:.1f} ms "
        f"(vector materialization only) vs deep copy {d_dt*1e3:.1f} ms "
        f"({d_dt/max(1e-9,v_dt):.1f}x)"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
