"""Matview refresh vs full rebuild at a scale where per-job overhead
does not mask the difference (VERDICT r7 next-round #7's 'refresh ≪
rebuild' claim; the sf0.1 bench extra tracks the same pair round-over-
round, but its source is small enough that Spark's fixed per-job cost
narrows the gap).

Source: N synthetic events committed as a snapshot table; each refresh
folds ONE appended ~100k-row version (append commits share every parent
file, so the version diff reads only the appended files — the realistic
event-table shape). Rebuild: a full `event_rollup` recompute over the
current source.

Usage: python scripts/matview_scale_smoke.py [n_rows] [batch_rows]
Results recorded in PLANS.md (round-8 matview section).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from implementing_scds_in_hive_spark.operators.incremental import (  # noqa: E402
    event_rollup,
)
from implementing_scds_in_hive_spark.operators.matview import (  # noqa: E402
    maintain_view,
)
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: E402
    read_table,
    write_snapshot,
)


def synth_events(spark, n: int, id_offset: int = 0):
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 2_592_000)
        ).alias("ts"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def main(n: int, batch: int) -> None:
    spark = get_spark("matview-scale-smoke")
    src = tempfile.mkdtemp(prefix="mv_scale_src_")
    view = tempfile.mkdtemp(prefix="mv_scale_view_")
    shutil.rmtree(src)
    shutil.rmtree(view)
    out = {"n_rows": n, "batch_rows": batch}

    t0 = time.time()
    write_snapshot(synth_events(spark, n), src)
    out["publish_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    maintain_view(spark, src, view, ["event_id"], to_version=1)
    out["init_load_s"] = round(time.time() - t0, 2)

    refresh_times = []
    for i in (1, 2, 3):
        write_snapshot(
            synth_events(spark, batch, id_offset=n + i * batch).coalesce(2),
            src,
            mode="append",
        )
        t0 = time.time()
        rep = maintain_view(
            spark, src, view, ["event_id"],
            retain_versions=2, retain_grace_seconds=0.0,
        )
        refresh_times.append(round(time.time() - t0, 2))
        assert rep["updated"] and not rep.get("rebuilt")
    out["refresh_s"] = sorted(refresh_times)[1]  # median of 3
    out["refresh_runs"] = refresh_times

    rebuild_times = []
    for _ in range(3):
        t0 = time.time()
        event_rollup(read_table(spark, src)).write.format("noop").mode(
            "overwrite"
        ).save()
        rebuild_times.append(round(time.time() - t0, 2))
    out["rebuild_s"] = sorted(rebuild_times)[1]
    out["rebuild_runs"] = rebuild_times
    out["speedup"] = round(out["rebuild_s"] / out["refresh_s"], 1)

    for r in (src, view):
        shutil.rmtree(r, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    main(n, b)
