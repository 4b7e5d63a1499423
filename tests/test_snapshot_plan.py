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
