"""Write-side surface: the Spark equivalents of the reference's DDL/DML
sinks (SURVEY §2.1 S2-S7) plus the layout controls that matter at 100 TB.

The reference's sinks are Hive tables written with INSERT INTO /
INSERT OVERWRITE (SCD_script.txt:8,141). Here:

* ``write_table``        — plain parquet dir, mode append/overwrite
* ``write_partitioned``  — hive-style directory partitioning; the scan
  side gets partition pruning for free when filters hit the partition
  column (date-partitioned facts are the 100 TB default)
* ``write_bucketed``     — ``bucketBy`` into the session catalog: joins
  and aggregations on the bucket key skip the shuffle entirely when both
  sides share the bucketing (co-located join). This is the physical
  design lever for the SCD merge at scale: bucket production AND staging
  by the business key and the merge's join needs no exchange.
* ``overwrite_atomic``   — the manifest snapshot-commit publish
  (operators/scd.py:publish → sources/snapshot.py) re-exported for
  discoverability: readers never see partial state, concurrent
  publishers linearize, old versions stay readable until vacuumed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from implementing_scds_in_hive_spark.operators.scd import publish as overwrite_atomic

__all__ = [
    "write_table",
    "write_partitioned",
    "write_bucketed",
    "overwrite_atomic",
    "compact",
    "compact_incremental",
    "compact_deletes",
    "consolidate_vectors",
    "clustering_overlap",
    "maintain_table",
    "vector_debt",
    "zorder_value",
    "write_zordered",
]


def write_table(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark,
    path: str,
    *,
    target_rows_per_file: int = 1_000_000,
    order_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    vacuum_grace_seconds: float = 600.0,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_rows_per_file`` rows, optionally range-clustered on
    ``order_cols`` (gives min/max row-group statistics that make later
    range filters prune). The 100 TB housekeeping job every streaming
    sink needs — micro-batches leave thousands of tiny files whose
    per-file open/footer cost dominates scans. Returns the row count.

    A hive-partitioned directory MUST pass its partition columns via
    ``partition_by`` or the rewrite would flatten the layout (enforced
    below by walking the ``key=value`` directory levels — nested
    multi-column layouts included).

    Snapshot tables (manifest-backed, ``sources/snapshot.py``) compact
    by committing a NEW snapshot of the coalesced rows and vacuuming the
    superseded versions: in-flight readers of the pre-compaction version
    keep working for at least ``vacuum_grace_seconds`` (their resolved
    file lists stay on disk inside the grace window), after which the
    old files reclaim. The manifest's own ``partition_by`` and recorded
    stats columns are reused when the caller does not override them, so
    compaction never silently flattens a partitioned snapshot or drops
    its data-skipping index. Plain dirs are rewritten in place via the
    temp-sibling + dir-swap (physical rewrite is the point here; the
    swap is the single-writer hazard the snapshot path removes)."""
    import os
    import re

    from implementing_scds_in_hive_spark.sources.snapshot import (
        is_snapshot_table,
        latest_version,
        load_manifest,
        read_table,
        vacuum,
        write_snapshot,
    )

    if is_snapshot_table(path):
        v = latest_version(path)
        m = load_manifest(path, v)
        if partition_by is None and m.get("partition_by"):
            partition_by = list(m["partition_by"])
        stats_cols = sorted(
            {c for fs in m.get("stats", {}).values() for c in fs}
        ) or None
        df = read_table(spark, path)
        n = df.count()
        n_files = max(1, -(-n // target_rows_per_file))
        out = (
            df.repartitionByRange(n_files, *order_cols)
            if order_cols
            else df.repartition(n_files)
        )
        write_snapshot(
            out, path, partition_by=partition_by, stats_cols=stats_cols,
            # content-preserving: the parent's app_meta (matview
            # watermarks, stream_txn exactly-once markers) must survive
            app_meta=m.get("app_meta"),
            # CAS on the version the rewrite was computed from: the
            # full-table read+rewrite is a LONG window, and committing
            # blind would clobber any concurrent commit's rows AND
            # regress its app_meta markers (r11 dml/sinks review —
            # compact_incremental/compact_deletes already CAS)
            expected_version=v,
        )
        vacuum(path, keep_last=1, grace_seconds=vacuum_grace_seconds)
        return n

    def _hive_partition_cols(root: str) -> list[str]:
        """Ordered partition-column list from the directory nesting:
        one column name per key=value level (hive layout guarantees all
        sibling dirs at a level share the column)."""
        cols: list[str] = []
        cur = root
        while True:
            subs = [
                d for d in os.listdir(cur)
                if os.path.isdir(os.path.join(cur, d)) and re.match(r"^[^=]+=", d)
            ]
            if not subs:
                return cols
            names = sorted({d.split("=")[0] for d in subs})
            if len(names) > 1:
                raise ValueError(
                    f"{cur} mixes partition columns {names} at one directory "
                    "level — not a valid hive layout"
                )
            cols.append(names[0])
            cur = os.path.join(cur, subs[0])

    detected = _hive_partition_cols(path)
    if detected and list(partition_by or []) != detected:
        raise ValueError(
            f"{path} is hive-partitioned by {detected}; pass partition_by={detected} "
            "to preserve the layout (compacting without it would flatten partitions)"
        )
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    out = (
        df.repartitionByRange(n_files, *order_cols)
        if order_cols
        else df.repartition(n_files)
    )
    _swap_overwrite(out, path, partition_by=partition_by)
    return n


def _swap_overwrite(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> None:
    """Legacy single-writer publish for PLAIN parquet dirs: materialize
    to a temp sibling, then swap directories. Self-overwrite-safe but
    NOT reader/multi-writer-safe — that is what the manifest protocol
    (``operators/scd.py:publish`` → ``sources/snapshot.py``) provides;
    this survives only as compact()'s physical in-place rewrite of
    non-snapshot directories."""
    import os
    import shutil
    import tempfile
    import uuid

    parent = os.path.dirname(os.path.abspath(path))
    tmp = os.path.join(parent, f".{os.path.basename(path)}.tmp-{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = None
    if os.path.exists(path):
        old = tempfile.mkdtemp(dir=parent, prefix=".old-")
        shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    if old and os.path.exists(old):
        shutil.rmtree(old)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Both sides of a join bucketed identically on the join key =>
    SortMergeJoin with ZERO Exchange on either side."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def zorder_value(cols: list, *, bits: int = 16):
    """Morton (Z-order) interleaving of N numeric columns: each value is
    rank-normalized by the caller (or passed as a bounded non-negative
    int), truncated to ``bits``, and bit-interleaved into one long —
    JVM-side bit arithmetic only.

    Clustering by this value is the multi-column file-skipping lever:
    a sort by (a, b) makes row-group min/max stats selective on ``a``
    only; a Z-order sort makes them selective on BOTH dimensions, so a
    2-D range predicate prunes row groups/files in proportion to its
    area rather than one side length. (Delta's OPTIMIZE ZORDER BY is
    this idea as a table service; here it is an explicit write-time
    transform.)"""
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        # the interleave must fit a signed long: shifting into bit 63+
        # overflows negative, which breaks the curve order (high-bit
        # rows sort BEFORE all others) and kills min/max pruning
        # silently (r11 dml/sinks review)
        raise ValueError(
            f"zorder_value: bits({bits}) * columns({n}) = {bits * n} "
            f"exceeds the 63-bit long budget — lower bits (e.g. "
            f"bits={63 // n}) or interleave fewer columns"
        )
    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.getbit(c.cast("bigint"), F.lit(b))
            acc = acc + (bit.cast("bigint") * F.lit(1 << (b * n + i)))
    return acc


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: list[str],
    bits: int = 12,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order of ``zorder_by`` columns.
    Columns are min/max-normalized into the bit budget via
    ``width_bucket`` — ONE map-side-combinable aggregation per write,
    never a global sort (a percent_rank normalization would be exact
    under skew but costs a single-partition window — the documented
    anti-pattern; heavy skew degrades bin balance here, not
    correctness, and stats pruning still applies inside the populated
    range). ``repartitionByRange`` on the z-value splits the curve
    across files (sampling-based, distributed), and
    ``sortWithinPartitions`` clusters inside each file — together,
    every file and row group owns a compact z-range, which is what
    makes min/max stats tight on EVERY z-dimension.

    tests/test_zorder.py measures the effect directly on parquet
    row-group footers via pyarrow: the fraction of row groups whose
    min/max box overlaps a small 2-D query box drops by >2x vs a
    linear (a, b) sort on the same data."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in zorder_by],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in zorder_by],
    ).collect()[0]
    work = df
    rank_cols = []
    nb = 1 << bits
    for c in zorder_by:
        if bounds[f"lo_{c}"] is None:
            # empty input or all-NULL column: no bounds to normalize
            # against — write unclustered rather than crash on
            # float(None) (r11 dml/sinks review); pruning on a column
            # with no values has nothing to prune anyway
            df.write.mode(mode).parquet(path)
            return
        lo, hi = float(bounds[f"lo_{c}"]), float(bounds[f"hi_{c}"])
        if hi <= lo:
            hi = lo + 1.0  # constant column: everything lands in bucket 0
        # width_bucket returns 1..nb in range; shift to 0-based and clamp
        zr = F.least(
            F.lit(nb - 1),
            F.greatest(
                F.lit(0),
                (
                    F.width_bucket(
                        F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(nb)
                    )
                    - 1
                ).cast("bigint"),
            ),
        )
        rank_cols.append(zr.alias(f"__zr_{c}"))
    work = work.select("*", *rank_cols)
    z = zorder_value([F.col(f"__zr_{c}") for c in zorder_by], bits=bits).alias("__z")
    work = work.select("*", z)
    n_parts = target_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 8)
    (
        work.repartitionByRange(n_parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zr_{c}" for c in zorder_by])
        .write.mode(mode)
        .parquet(path)
    )


def compact_incremental(
    spark,
    path: str,
    *,
    target_bytes: int = 128 << 20,
    small_ratio: float = 0.5,
    min_small_files: int = 2,
) -> dict:
    """Bin-packing small-file compaction for SNAPSHOT tables via the
    file-granular ``mode="replace"`` commit — the Delta ``OPTIMIZE``
    shape, and the housekeeping job :func:`compact` cannot be at scale:
    the full compactor rewrites the WHOLE table, so running it on a
    100 TB table to merge a day's small streaming files costs a 100 TB
    rewrite. This one rewrites ONLY files smaller than
    ``target_bytes * small_ratio``, bin-packed to ``target_bytes``
    outputs, and carries every right-sized file by reference.

    Clustering survives: when the manifest records stats columns the
    rewritten rows are range-repartitioned on them (fresh disjoint
    min/max per output file, so data skipping keeps biting); a
    partitioned table repartitions on its partition columns so each
    hive partition's small files merge without cross-partition mixing.
    The commit CASes on the inspected version — a concurrent writer
    raises :class:`~implementing_scds_in_hive_spark.sources.snapshot.
    CommitConflictError` and the compaction can simply be re-run (it is
    content-preserving, so losing a race costs nothing).

    Returns ``{"version", "files_total", "files_compacted",
    "files_written", "bytes_compacted"}``; a no-op (fewer than
    ``min_small_files`` small files) returns the current version with
    zero counts."""
    import math

    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_manifest_files,
        write_snapshot,
    )

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    m = load_manifest(path, v)
    sizes = {
        f: os.path.getsize(os.path.join(path, f)) for f in m["files"]
    }
    small = sorted(
        f for f, s in sizes.items() if s < target_bytes * small_ratio
    )
    out = {"version": v, "files_total": len(m["files"])}
    if len(small) < min_small_files:
        return {
            **out, "files_compacted": 0, "files_written": 0,
            "bytes_compacted": 0,
        }
    bytes_small = sum(sizes[f] for f in small)
    n_out = max(1, math.ceil(bytes_small / target_bytes))
    rows = read_manifest_files(spark, path, m, small)
    stats_cols = sorted(
        {c for fs in m.get("stats", {}).values() for c in fs}
    )
    part_cols = list(m["partition_by"])
    packed = _repack(rows, n_out, part_cols, stats_cols)
    new_v = write_snapshot(
        packed,
        path,
        partition_by=part_cols or None,
        mode="replace",
        expected_version=v,
        stats_cols=stats_cols or None,
        drop_files=small,
        # content-preserving: carry the parent's app_meta (matview
        # watermarks, stream_txn exactly-once markers) verbatim
        app_meta=m.get("app_meta"),
    )
    n_written = len(load_manifest(path, new_v)["files"]) - (
        len(m["files"]) - len(small)
    )
    return {
        **out,
        "version": new_v,
        "files_compacted": len(small),
        "files_written": n_written,
        "bytes_compacted": bytes_small,
    }


def clustering_overlap(root: str, col: str) -> float | None:
    """Manifest-derivable clustering-health metric (VERDICT r7
    next-round #4): the expected number of files a random point probe on
    ``col`` must open, estimated driver-side from the manifest's
    per-file min/max stats alone — ``sum(per-file range width) /
    covered span``. 1.0 ≈ perfectly disjoint ranges (a stats prune opens
    ~one file per key); the value decays toward the file count as
    repeated CoW merges rewrite touched files with merged (wider) key
    ranges, until pruning stops biting. Numeric stats only; returns
    ``None`` when fewer than two files carry numeric stats for ``col``
    (nothing to measure). O(#files) driver-side, no data read."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
    )

    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    m = load_manifest(root, v)
    ranges = []
    for fs in m.get("stats", {}).values():
        rng = fs.get(col)
        if (
            rng
            and isinstance(rng[0], (int, float))
            and not isinstance(rng[0], bool)
        ):
            ranges.append((float(rng[0]), float(rng[1])))
    if len(ranges) < 2:
        return None
    span = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
    if span <= 0:
        return float(len(ranges))  # all files cover one point
    return sum(hi - lo for lo, hi in ranges) / span


def vector_debt(root: str) -> dict:
    """Manifest-derived merge-on-read debt — what every vectored read
    pays until ``compact_deletes`` folds: ``vectored_fraction`` (share
    of data files whose scan takes the overlay anti-join) and
    ``vector_bytes`` / ``bytes_fraction`` (tombstone volume vs data
    volume, the broadcast-side bill). Driver-side file-size walk,
    no data read."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
    )

    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    m = load_manifest(root, v)
    deletes = m.get("deletes") or {}
    n_files = len(m["files"])
    vec_rels = {r for rels in deletes.values() for r in rels}
    vec_bytes = sum(
        os.path.getsize(os.path.join(root, r)) for r in vec_rels
    )
    data_bytes = sum(
        os.path.getsize(os.path.join(root, f)) for f in m["files"]
    )
    return {
        "version": v,
        "vectored_files": len(deletes),
        "vectored_fraction": len(deletes) / max(1, n_files),
        "vector_files": len(vec_rels),
        "vector_bytes": vec_bytes,
        "bytes_fraction": vec_bytes / max(1, data_bytes),
    }


def maintain_table(
    spark,
    root: str,
    col: str,
    *,
    max_overlap: float = 2.0,
    max_vectored_fraction: float = 0.2,
    max_vector_files: int | None = 32,
    target_rows_per_file: int = 1_000_000,
    vacuum_grace_seconds: float = 600.0,
) -> dict:
    """Table maintenance policy loop (the ``maintain_index`` idiom
    applied to the table itself), two manifest-only health metrics and
    their remedies:

    * **merge-on-read debt**, two triggers with two DIFFERENT remedies
      (r10 — matched to what each trigger actually measures):

      - past ``max_vectored_fraction`` of data files carrying deletion
        vectors (:func:`vector_debt`), :func:`compact_deletes` folds
        the tombstones back into clean DATA files — the full rewrite
        is justified because the debt here is per-data-file overlay
        joins, which only retiring the vectors removes;
      - past ``max_vector_files`` DISTINCT live vector files when the
        fraction is still healthy, :func:`consolidate_vectors` rewrites
        ONLY the vector files (O(vector bytes), data carried by
        reference). This trigger exists because the overlay reads
        vectors per (file -> its manifest vector list): each distinct
        list is one plan branch, and the measured bill grows ~linearly
        in VECTOR FILES at fixed vectored fraction
        (scripts/vector_overlay_smoke.py: 64/64 files vectored costs
        2.7x clean through ONE vector file but 15.3x through 44 of
        them) — a plan-branch problem, not a tombstone-volume problem,
        so rewriting data files for it was paying an O(data) bill for
        an O(vector) debt. The fraction cap alone scales the allowed
        vector-file count with TABLE SIZE (0.2 x 10^5 files would
        permit ~2*10^4 branches), so the file-count trigger is a
        CONSTANT bound — together they make a steady drip of small
        disjoint MoR commits sustainable indefinitely.

      Folded FIRST: a fold rewrites at most the vectored files
      (cluster-preserving), and a subsequent recluster — if still
      needed — then sees the folded layout instead of rewriting rows
      twice.
    * **clustering decay** — :func:`clustering_overlap` past
      ``max_overlap`` triggers one re-clustering :func:`compact` pass
      (range-repartitioned on the table's stats columns, partition
      layout preserved) so the stats prune bites again.

    Content-preserving and cheap to re-run; a healthy table returns
    without reading any data (both metrics are manifest-only). Run on
    the same cadence as ``compact_incremental``. Returns
    ``{"folded", "fold_tier", "vectored_fraction", "vector_files",
    "reclustered", "overlap"}`` plus, after a rewrite,
    ``{"overlap_after", "rows"}``; ``fold_tier`` is ``"data"`` /
    ``"vectors"`` / ``None``."""
    debt = vector_debt(root)
    out = {
        "folded": False,
        "fold_tier": None,
        "vectored_fraction": round(debt["vectored_fraction"], 4),
        "vector_files": debt["vector_files"],
    }
    if debt["vectored_fraction"] > max_vectored_fraction:
        compact_deletes(spark, root)
        out["folded"] = True
        out["fold_tier"] = "data"
        # the fold retired every live vector — report the post-fold
        # state like the escalation branch does, or a monitor alerting
        # on vector_files fires on a just-folded table (r11 review)
        out["vector_files"] = 0
        out["vectored_fraction"] = 0.0
    elif (
        max_vector_files is not None
        and debt["vector_files"] > max_vector_files
    ):
        # plan-branch debt with healthy tombstone volume: the cheap
        # tier — consolidate the vector FILES, carry data by reference
        res = consolidate_vectors(spark, root)
        out["folded"] = res["consolidated"]
        out["fold_tier"] = "vectors" if res["consolidated"] else None
        out["vector_files"] = res["vector_files_after"]
        if res["vector_files_after"] > max_vector_files:
            # consolidation could not get under the bound (already one
            # bin-packed list per schema: many vector SCHEMAS, or raw
            # tombstone bytes needing more bins than the cap) — without
            # escalation the trigger would re-fire forever with no
            # remedy (r10 self-review); the data fold retires the
            # vectors entirely
            compact_deletes(spark, root)
            out["folded"] = True
            out["fold_tier"] = "data"
            out["vector_files"] = 0
            out["vectored_fraction"] = 0.0
    ov = clustering_overlap(root, col)
    if ov is None or ov <= max_overlap:
        return {**out, "reclustered": False, "overlap": ov}
    n = compact(
        spark,
        root,
        target_rows_per_file=target_rows_per_file,
        order_cols=[col],
        vacuum_grace_seconds=vacuum_grace_seconds,
    )
    return {
        **out,
        "reclustered": True,
        "overlap": ov,
        "overlap_after": clustering_overlap(root, col),
        "rows": n,
    }


def _repack(rows, n_out: int, part_cols: list[str], stats_cols: list[str]):
    """Shared compaction layout: range on (partition, cluster) keeps each
    task's rows contiguous in BOTH — partitionBy still splits files per
    hive partition, and within a partition each file covers a disjoint
    cluster range, so the data-skipping stats stay tight instead of
    every compacted file spanning its partition's whole key range."""
    cluster_cols = [c for c in stats_cols if c not in part_cols]
    if part_cols and cluster_cols:
        return rows.repartitionByRange(
            n_out, *part_cols, *cluster_cols
        ).sortWithinPartitions(*part_cols, *cluster_cols)
    if part_cols:
        return rows.repartition(n_out, *part_cols)
    if cluster_cols:
        return rows.repartitionByRange(
            n_out, *cluster_cols
        ).sortWithinPartitions(*cluster_cols)
    return rows.repartition(n_out)


def consolidate_vectors(
    spark, path: str, *, target_bytes: int = 64 << 20
) -> dict:
    """The vectors-ONLY fold tier (VERDICT r9 next-round #3): rewrite
    the deletion-VECTOR files without touching a single data file.

    Why it exists: the read overlay pays one plan branch per DISTINCT
    (data file -> vector-file list) group, and the measured bill is
    ~linear in DISTINCT VECTOR FILES at fixed vectored fraction
    (scripts/vector_overlay_smoke.py: 64/64 files vectored reads at
    2.7x clean through ONE vector file but 15.3x through 44). A steady
    drip of small disjoint MoR commits therefore accumulates plan-branch
    debt even when tombstone VOLUME stays tiny — and
    ``compact_deletes`` retires it by rewriting all vectored DATA
    files, an O(data bytes) bill for an O(vector bytes) problem. This
    verb reads every live tombstone (restricted per data file to ITS
    manifest list, exactly like the read overlay — a shared vector file
    must not resurrect superseded positions), regroups them into ONE
    bin-packed vector-file set per vector SCHEMA (vectors from
    different commits can be keyed differently and must not merge), and
    commits a replace manifest where every vectored data file is
    carried BY REFERENCE and points at the consolidated list. After the
    commit the overlay is one branch per schema (usually one total);
    the superseded vector files become unreferenced and the
    file-granular vacuum reclaims them.

    Content-preserving (the live row set is untouched), CASes on the
    inspected version like every fold, and a no-op — no version burned
    — when the vectors are already consolidated. Returns ``{"version",
    "vector_files_before", "vector_files_after", "lists_before",
    "lists_after", "consolidated"}``."""
    import math

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        commit,
        group_vector_lists,
        latest_version,
        load_manifest,
        stage_delete_vectors,
    )

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    m = load_manifest(path, v)
    deletes = m.get("deletes") or {}
    all_rels = sorted({r for rels in deletes.values() for r in rels})
    out = {
        "version": v,
        "vector_files_before": len(all_rels),
        "lists_before": len({tuple(rels) for rels in deletes.values()}),
    }
    if not deletes:
        return {
            **out,
            "vector_files_after": 0,
            "lists_after": 0,
            "consolidated": False,
        }
    # group data files by their list, then lists by vector SCHEMA (the
    # read overlay's exact grouping — shared helper)
    groups = group_vector_lists(path, deletes)
    # per-group consolidation target: bin-packed by byte size; groups
    # that are ALREADY one bin-packed list are skipped entirely — their
    # manifest entries carry by the replace semantics (a staged vector
    # only supersedes files it covers), so a clean positional group
    # pays nothing when a fragmented row-format group folds (r10
    # self-review)
    plan = []
    for _schema, lists in sorted(groups.items()):
        rel_set = sorted({r for rels, _served in lists for r in rels})
        bytes_g = sum(
            os.path.getsize(os.path.join(path, r)) for r in rel_set
        )
        n_out = max(1, math.ceil(bytes_g / target_bytes))
        if len(lists) > 1 or len(rel_set) > n_out:
            plan.append((lists, n_out))
    if not plan:
        return {
            **out,
            "vector_files_after": len(all_rels),
            "lists_after": out["lists_before"],
            "consolidated": False,
        }
    staged = {
        # vectors-only commit: no data rows staged, so NO data stage
        # dir at all (snapshot_dir=None, ADVICE r10 — the old phantom
        # 'snap-consolidate-none' name rode in snapshot_dirs forever);
        # the vector stage dirs ride in extra_dirs so commit's
        # existence check covers them
        "snapshot_dir": None,
        "files": [],
        "schema": m["schema"],
        "partition_by": list(m["partition_by"]),
        "extra_dirs": [],
        "delete_vectors": {},
        "drop_files": [],
    }
    for lists, n_out in plan:
        vec = None
        for rels, served in lists:
            p = spark.read.parquet(
                *[os.path.join(path, r) for r in rels]
            ).where(F.col(DELETE_FILE_COL).isin(served))
            vec = p if vec is None else vec.unionByName(p)
        dv_dir, dv_files, covered = stage_delete_vectors(
            vec.coalesce(n_out), path
        )
        want = sorted(f for _rels, served in lists for f in served)
        if covered != want:  # pragma: no cover - protocol invariant
            raise RuntimeError(
                f"consolidation lost coverage: staged {len(covered)} "
                f"files, expected {len(want)}"
            )
        staged["extra_dirs"].append(dv_dir)
        for f in covered:
            staged["delete_vectors"][f] = list(dv_files)
    new_v = commit(path, staged, mode="replace", expected_version=v)
    m2 = load_manifest(path, new_v)
    d2 = m2.get("deletes") or {}
    return {
        **out,
        "version": new_v,
        "vector_files_after": len(
            {r for rels in d2.values() for r in rels}
        ),
        "lists_after": len({tuple(rels) for rels in d2.values()}),
        "consolidated": True,
    }


def compact_deletes(
    spark, path: str, *, target_bytes: int = 128 << 20
) -> dict:
    """Fold deletion vectors back into clean data files — the
    maintenance half of the merge-on-read protocol (the Delta
    ``REORG TABLE ... APPLY (PURGE)`` shape). Every vectored file's LIVE
    rows (tombstones applied by the manifest-pinned read) are rewritten
    into bin-packed, cluster-preserving files via ONE replace commit
    that drops the vectored files; the dropped files' vector entries die
    with them, the superseded vector files become unreferenced, and the
    file-granular vacuum reclaims both two-phase. Cost is bounded by the
    vectored-file set, never the table — run it on the same cadence as
    ``compact_incremental`` to keep the read overlay's broadcast
    tombstone set small.

    CASes on the inspected version: a concurrent writer raises
    :class:`~implementing_scds_in_hive_spark.sources.snapshot.
    CommitConflictError` and the fold can simply be re-run (it is
    content-preserving, so losing a race costs nothing). Returns
    ``{"version", "files_total", "files_folded", "files_written"}``."""
    import math

    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_manifest_files,
        write_snapshot,
    )

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    m = load_manifest(path, v)
    vectored = sorted(m.get("deletes", {}))
    out = {"version": v, "files_total": len(m["files"])}
    if not vectored:
        return {**out, "files_folded": 0, "files_written": 0}
    rows = read_manifest_files(spark, path, m, vectored)
    bytes_vectored = sum(
        os.path.getsize(os.path.join(path, f)) for f in vectored
    )
    n_out = max(1, math.ceil(bytes_vectored / target_bytes))
    stats_cols = sorted(
        {c for fs in m.get("stats", {}).values() for c in fs}
    )
    part_cols = list(m["partition_by"])
    packed = _repack(rows, n_out, part_cols, stats_cols)
    new_v = write_snapshot(
        packed,
        path,
        partition_by=part_cols or None,
        mode="replace",
        expected_version=v,
        stats_cols=stats_cols or None,
        drop_files=vectored,
        # content-preserving: carry the parent's app_meta (matview
        # watermarks, stream_txn exactly-once markers) verbatim
        app_meta=m.get("app_meta"),
    )
    m2 = load_manifest(path, new_v)
    assert not m2.get("deletes"), "fold must leave no live vectors"
    return {
        **out,
        "version": new_v,
        "files_folded": len(vectored),
        "files_written": len(m2["files"]) - (len(m["files"]) - len(vectored)),
    }
