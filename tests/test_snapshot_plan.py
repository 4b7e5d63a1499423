"""Plan-level guarantees of the snapshot reader: a manifest-backed read
must scan EXACTLY the committed manifest's files — never a directory
listing that could race a concurrent publish, never another version's
files, never a crashed writer's orphan stage."""

from __future__ import annotations

import os

from implementing_scds_in_hive_spark.sources.snapshot import (
    load_manifest,
    read_snapshot,
    stage_files,
    write_snapshot,
)


def _scanned_files(df, root):
    return sorted(os.path.relpath(f.replace("file:", ""), root) for f in df.inputFiles())


def test_read_scans_exactly_the_manifest_files(spark, tmp_path):
    root = str(tmp_path / "t")
    df1 = spark.range(0, 1000).selectExpr("id", "id * 2 AS n").repartition(4)
    write_snapshot(df1, root)
    # a second committed version AND an uncommitted orphan stage exist
    write_snapshot(
        spark.range(0, 10).selectExpr("id", "id * 3 AS n").repartition(2), root
    )
    stage_files(spark.range(5).selectExpr("id", "id AS n"), root)

    for v in (1, 2):
        manifest_files = sorted(load_manifest(root, v)["files"])
        assert _scanned_files(read_snapshot(spark, root, version=v), root) == (
            manifest_files
        ), f"version {v} scan != manifest"
    # latest == v2 and its file count reflects v2's partitioning
    assert len(load_manifest(root, 2)["files"]) == 2


def test_append_manifest_scans_both_generations(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(spark.range(3).selectExpr("id", "id AS n"), root)
    write_snapshot(
        spark.range(3, 6).selectExpr("id", "id AS n"), root, mode="append"
    )
    m2 = load_manifest(root, 2)
    got = _scanned_files(read_snapshot(spark, root, version=2), root)
    assert got == sorted(m2["files"])
    assert len(m2["snapshot_dirs"]) == 2


def test_manifest_stats_prune_file_skipping(spark, tmp_path):
    """Delta-style data skipping from the commit log: a range-clustered
    snapshot with stats_cols records per-file min/max; a pruned read
    scans only the overlapping files and stays row-identical to the
    full-scan filter."""
    root = str(tmp_path / "t")
    df = (
        spark.range(0, 100_000)
        .selectExpr("id", "cast(id % 13 as string) AS v")
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    write_snapshot(df, root, stats_cols=["id"])
    m = load_manifest(root, 1)
    assert len(m["files"]) == 8 and len(m["stats"]) == 8
    assert all("id" in s for s in m["stats"].values())

    pruned = read_snapshot(spark, root, prune={"id": (20_000, 21_000)})
    full = read_snapshot(spark, root)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert len(pruned.inputFiles()) <= 2
    want = sorted(r["id"] for r in full.where("id between 20000 and 21000").collect())
    got = sorted(
        r["id"] for r in pruned.where("id between 20000 and 21000").collect()
    )
    assert got == want and len(got) == 1001

    # half-open intervals + a column without recorded stats is a no-op
    hi_only = read_snapshot(spark, root, prune={"id": (None, 5)})
    assert len(hi_only.inputFiles()) == 1
    no_stats = read_snapshot(spark, root, prune={"v": ("0", "1")})
    assert len(no_stats.inputFiles()) == 8  # keep-all: skipping never drops rows

    # disjoint interval -> empty scan, schema intact
    nothing = read_snapshot(spark, root, prune={"id": (10_000_000, None)})
    assert nothing.count() == 0
    assert [f.name for f in nothing.schema.fields] == ["id", "v"]


def test_manifest_stats_string_columns_and_append(spark, tmp_path):
    root = str(tmp_path / "t")
    a = spark.createDataFrame([(1, "apple"), (2, "berry")], "id long, w string")
    b = spark.createDataFrame([(3, "mango"), (4, "zebra")], "id long, w string")
    write_snapshot(a.coalesce(1), root, stats_cols=["w"])
    write_snapshot(b.coalesce(1), root, mode="append", stats_cols=["w"])
    m = load_manifest(root, 2)
    assert len(m["stats"]) == 2  # append merged parent stats
    pruned = read_snapshot(spark, root, version=2, prune={"w": ("a", "c")})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r["w"] for r in pruned.collect()) == ["apple", "berry"]


def test_mor_overlay_plan_broadcast_anti_and_clean_bypass(spark, tmp_path):
    """Plan guarantees of the deletion-vector read overlay (r8):

    * the tombstone application is a BROADCAST left-anti hash join —
      the big (data) side never shuffles for the overlay;
    * a read restricted to files WITHOUT vectors compiles to a plain
      scan with no join at all (clean files bypass the overlay);
    * the vector scan reads only the vector files for the files read.
    """
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    root = str(tmp_path / "t")
    df = spark.range(1000).selectExpr("id", "id * 2 AS n")
    write_snapshot(
        df.repartitionByRange(4, "id").sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    m1 = load_manifest(root, 1)
    cand = read_manifest_files(spark, root, m1, m1["files"], rel_path_col="__rel")
    tomb = cand.where(F.col("id") < 5).select(
        F.col("__rel").alias("__file"), "id"
    )
    write_snapshot(
        spark.createDataFrame([], "id long, n long"),
        root, mode="replace", expected_version=1,
        drop_files=[], delete_vectors=tomb,
    )
    m2 = load_manifest(root, 2)
    vectored = sorted(m2["deletes"])
    clean = [f for f in m2["files"] if f not in m2["deletes"]]
    assert vectored and clean

    full = read_manifest_files(spark, root, m2, m2["files"])
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert full.count() == 995

    clean_read = read_manifest_files(spark, root, m2, clean)
    clean_plan = clean_read._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in clean_plan  # overlay fully bypassed

    # the overlay's inputs: data files read + ONLY the relevant vectors
    vec_files = {r for rels in m2["deletes"].values() for r in rels}
    scanned = set(_scanned_files(full, root))
    assert scanned == set(m2["files"]) | vec_files


def test_mor_overlay_respects_broadcast_threshold(spark, tmp_path):
    """Past the session broadcast threshold the overlay must NOT force a
    driver-side broadcast of the tombstones (an overdue fold could OOM
    the driver) — the planner falls back to a shuffle anti-join and the
    result is unchanged."""
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    root = str(tmp_path / "t")
    df = spark.range(200).selectExpr("id", "id * 2 AS n")
    write_snapshot(df.repartition(2), root, stats_cols=["id"])
    m1 = load_manifest(root, 1)
    cand = read_manifest_files(
        spark, root, m1, m1["files"], rel_path_col="__rel"
    )
    tomb = cand.where(F.col("id") < 3).select(
        F.col("__rel").alias("__file"), "id"
    )
    write_snapshot(
        spark.createDataFrame([], "id long, n long"),
        root, mode="replace", expected_version=1,
        drop_files=[], delete_vectors=tomb,
    )
    m2 = load_manifest(root, 2)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        full = read_manifest_files(spark, root, m2, m2["files"])
        plan = full._jdf.queryExecution().executedPlan().toString()
        # the tiny basename->rel MAP join stays broadcast (explicitly
        # hinted, O(#files) rows); the TOMBSTONE anti-join must not be
        anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti_lines and all(
            "Broadcast" not in ln for ln in anti_lines
        ), anti_lines
        assert full.count() == 197  # correctness unchanged
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_positional_overlay_plan_shape(spark, tmp_path):
    """Positional vectors keep every plan guarantee of the keyed
    overlay — broadcast left-anti, clean-file bypass, exact scan set —
    with a NARROWER join: the anti-join keys on (file, row ordinal)
    only, so the condition carries no data columns and no null-safe
    comparators, whatever the table width."""
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    root = str(tmp_path / "t")
    df = spark.range(1000).selectExpr(
        "id", "id * 2 AS a", "id * 3 AS b", "CAST(id AS STRING) AS c"
    )
    write_snapshot(
        df.repartitionByRange(4, "id").sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    m1 = load_manifest(root, 1)
    cand = read_manifest_files(
        spark, root, m1, m1["files"],
        rel_path_col="__rel", row_pos_col="__pos",
    )
    tomb = cand.where(F.col("id") < 5).select(
        F.col("__rel").alias("__file"), "__pos"
    )
    write_snapshot(
        spark.createDataFrame([], df.schema),
        root, mode="replace", expected_version=1,
        drop_files=[], delete_vectors=tomb,
    )
    m2 = load_manifest(root, 2)
    clean = [f for f in m2["files"] if f not in m2["deletes"]]
    assert m2["deletes"] and clean

    full = read_manifest_files(spark, root, m2, m2["files"])
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # the anti-join condition references positions, not data columns:
    # no null-safe comparators anywhere in the plan
    assert "<=>" not in plan
    assert full.count() == 995

    clean_read = read_manifest_files(spark, root, m2, clean)
    assert "Join" not in (
        clean_read._jdf.queryExecution().executedPlan().toString()
    )

    vec_files = {r for rels in m2["deletes"].values() for r in rels}
    scanned = set(_scanned_files(full, root))
    assert scanned == set(m2["files"]) | vec_files
