"""File-granular copy-on-write SCD2 merge (VERDICT r6 next-round #1).

The invariant that makes the feature trustworthy: with a STABLE key
strategy, ``scd2_merge_cow`` (rewrite only touched files, carry the rest
by reference) commits a table ROW-IDENTICAL to the full-rewrite
``scd2_merge`` over all of production — across Type-1 rewrites,
close-outs, version inserts, brand-new keys, NULL flips, and keys whose
history spans files. Plus the protocol properties replace mode adds:
CAS on the parent version, crash atomicity, drop-set validation, and
file-granular vacuum of superseded files whose stage dir lives on.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    assign_surrogate_keys,
    scd2_merge,
    scd2_merge_cow,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    CommitConflictError,
    latest_version,
    list_versions,
    load_manifest,
    read_snapshot,
    read_table,
    vacuum,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"


def _publish_v1(spark, root, strategy="hash", n_files=8):
    """Initial dimension: fixture production with stable keys already
    assigned, range-clustered on the business key so the manifest's
    per-file stats are disjoint and pruning bites."""
    prod = assign_surrogate_keys(
        customer_production(spark, SF), CUSTOMER_CFG, strategy=strategy
    )
    clustered = prod.repartitionByRange(n_files, "c_custkey").sortWithinPartitions(
        "c_custkey"
    )
    return write_snapshot(
        clustered, root, stats_cols=["c_custkey"]
    )


def _canon(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


@pytest.mark.parametrize("strategy", ["hash", "md5"])
def test_cow_equals_full_rewrite(spark, tmp_path, strategy):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, strategy=strategy)
    staging = customer_staging(spark, SF)

    rep = scd2_merge_cow(spark, root, staging, CUSTOMER_CFG, AS_OF,
                         key_strategy=strategy)
    got = read_table(spark, root)

    expected = scd2_merge(
        read_snapshot(spark, root, version=1),
        staging,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy=strategy,
        broadcast_staging=True,
    )
    assert _canon(got) == _canon(expected)
    assert rep["version"] == 2
    # the fixture touches most keys, so most files rewrite here — the
    # 1% sparse case below is where the file win shows
    assert 0 < rep["files_rewritten"] <= rep["files_total"]


def test_cow_sparse_batch_rewrites_few_files(spark, tmp_path):
    """The 100 TB motivation, measured: a ~1% staging batch (single
    contiguous key range) rewrites a small fraction of the table's
    files; untouched files are carried by reference (same physical
    paths in both manifests)."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=16)
    m1 = load_manifest(root, 1)

    full = customer_staging(spark, SF)
    lo, hi = 100, 115  # contiguous keys => stats-prunable range
    sparse = full.where(F.col("c_custkey").between(lo, hi))
    n_batch = sparse.count()
    assert n_batch > 0

    rep = scd2_merge_cow(spark, root, sparse, CUSTOMER_CFG, AS_OF)
    m2 = load_manifest(root, 2)

    assert rep["files_rewritten"] <= rep["files_candidates"]
    assert rep["files_candidates"] < rep["files_total"]  # stats pruned
    # contiguous range -> a handful of boundary files (range partition
    # boundaries are sample-based, so allow some slack), never the table
    assert rep["files_rewritten"] <= 3
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) == len(m1["files"]) - rep["files_rewritten"]

    # row-identity vs the full rewrite
    expected = scd2_merge(
        read_snapshot(spark, root, version=1),
        sparse,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy="hash",
        broadcast_staging=True,
    )
    assert _canon(read_table(spark, root)) == _canon(expected)


def test_cow_all_new_keys_appends_without_dropping(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    m1 = load_manifest(root, 1)
    fresh = customer_staging(spark, SF).where(
        F.col("c_custkey") > 1_000_000
    )  # the %20==7 clones: brand-new keys only
    n_new = fresh.count()
    assert n_new > 0
    rep = scd2_merge_cow(spark, root, fresh, CUSTOMER_CFG, AS_OF)
    assert rep["files_rewritten"] == 0
    m2 = load_manifest(root, 2)
    assert set(m1["files"]) <= set(m2["files"])
    assert read_table(spark, root).count() == read_snapshot(
        spark, root, version=1
    ).count() + n_new


def test_cow_empty_staging_is_noop(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    empty = customer_staging(spark, SF).where(F.lit(False))
    rep = scd2_merge_cow(spark, root, empty, CUSTOMER_CFG, AS_OF)
    assert rep == {
        "version": 1,
        "files_total": rep["files_total"],
        "files_candidates": 0,
        "files_rewritten": 0,
    }
    assert list_versions(root) == [1]


def test_cow_rejects_renumbering_strategies(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    staging = customer_staging(spark, SF)
    with pytest.raises(ValueError, match="stable key strategy"):
        scd2_merge_cow(spark, root, staging, CUSTOMER_CFG, AS_OF,
                       key_strategy="two_pass")


def test_replace_mode_cas_and_validation(spark, tmp_path):
    """Replace is a read-modify-write: it must CAS on the version the
    drop-set came from, reject unknown drop files, and reject schema or
    partitioning drift against the carried parent files."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(df, root)
    m1 = load_manifest(root, 1)
    one = spark.createDataFrame([(9, "z")], "id long, v string")

    with pytest.raises(ValueError, match="requires expected_version"):
        write_snapshot(one, root, mode="replace", drop_files=[])

    with pytest.raises(ValueError, match="not in parent"):
        write_snapshot(one, root, mode="replace", expected_version=1,
                       drop_files=["data/nope/part-0.parquet"])

    with pytest.raises(ValueError, match="must match the parent"):
        write_snapshot(
            one.withColumn("extra", F.lit(1)), root, mode="replace",
            expected_version=1, drop_files=[],
        )

    # a concurrent overwrite advances the table; the stale replace loses
    write_snapshot(df, root)
    with pytest.raises(CommitConflictError):
        write_snapshot(one, root, mode="replace", expected_version=1,
                       drop_files=list(m1["files"]))
    # loser left no garbage referenced; winner intact
    assert latest_version(root) == 2
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == [1, 2]


def test_replace_commit_semantics(spark, tmp_path):
    """Drop a subset, add staged files, carry the rest by reference:
    content = (parent - dropped) + staged; stats follow the files."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, v string"
    )
    write_snapshot(
        df.repartitionByRange(4, "id").sortWithinPartitions("id"),
        root, stats_cols=["id"],
    )
    m1 = load_manifest(root, 1)
    assert len(m1["files"]) == 4
    # replace the file holding ids {0,1} with one holding {0,1,100}
    victim = next(
        f for f, s in m1["stats"].items() if s["id"][0] == 0
    )
    repl = spark.createDataFrame(
        [(0, "V0"), (1, "V1"), (100, "new")], "id long, v string"
    ).coalesce(1)
    v2 = write_snapshot(repl, root, mode="replace", expected_version=1,
                        drop_files=[victim], stats_cols=["id"])
    assert v2 == 2
    m2 = load_manifest(root, 2)
    assert victim not in m2["files"]
    assert victim not in m2.get("stats", {})
    assert m2["replaced"] == [victim]
    assert len(m2["files"]) == len(m1["files"])  # -1 dropped, +1 staged
    got = {(r["id"], r["v"]) for r in read_table(spark, root).collect()}
    assert got == {(0, "V0"), (1, "V1"), (100, "new")} | {
        (i, f"v{i}") for i in range(2, 8)
    }
    # time travel to v1 still sees the original content
    assert sorted(r["id"] for r in read_snapshot(spark, root, version=1).collect()) == list(range(8))


def test_vacuum_reclaims_replaced_files_two_phase(spark, tmp_path):
    """A replaced file's stage dir lives on (untouched siblings are
    carried), so reclamation must be FILE-granular: once no kept
    manifest references the file, vacuum tombstones it (phase 1) and
    deletes it a grace window later (phase 2)."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, v string"
    )
    write_snapshot(
        df.repartitionByRange(4, "id").sortWithinPartitions("id"),
        root, stats_cols=["id"],
    )
    m1 = load_manifest(root, 1)
    victim = next(f for f, s in m1["stats"].items() if s["id"][0] == 0)
    repl = spark.createDataFrame([(0, "V0"), (1, "V1")], "id long, v string").coalesce(1)
    write_snapshot(repl, root, mode="replace", expected_version=1,
                   drop_files=[victim], stats_cols=["id"])
    vpath = os.path.join(root, victim)
    assert os.path.exists(vpath)

    # keep_last=1 drops v1 (the only manifest referencing the victim)
    res = vacuum(root, keep_last=1, grace_seconds=3600.0)
    assert res["removed_files"] == []  # phase 1: marker written, file kept
    assert os.path.exists(vpath)
    assert os.path.exists(vpath + ".dropped-at")

    with open(vpath + ".dropped-at", "w") as f:
        f.write("1.0")  # age the marker past any grace
    res2 = vacuum(root, keep_last=1, grace_seconds=3600.0)
    assert res2["removed_files"] == [victim]
    assert not os.path.exists(vpath)
    assert not os.path.exists(vpath + ".dropped-at")
    # the carried siblings and current content are untouched
    got = {(r["id"], r["v"]) for r in read_table(spark, root).collect()}
    assert got == {(0, "V0"), (1, "V1")} | {(i, f"v{i}") for i in range(2, 8)}


def test_replace_crash_before_link_leaves_parent_intact(spark, tmp_path, monkeypatch):
    """Crash injection on both sides of the replace commit: before the
    manifest link the parent version is fully readable and the stage is
    an unreferenced orphan; the commit is atomic or absent."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(df, root)
    m1 = load_manifest(root, 1)

    real_link = os.link
    def boom(*a, **k):
        raise RuntimeError("crash before manifest link")
    monkeypatch.setattr(snap.os, "link", boom)
    one = spark.createDataFrame([(9, "z")], "id long, v string")
    with pytest.raises(RuntimeError, match="crash before"):
        write_snapshot(one, root, mode="replace", expected_version=1,
                       drop_files=list(m1["files"]))
    monkeypatch.setattr(snap.os, "link", real_link)

    assert list_versions(root) == [1]
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == [1, 2]
    # the orphaned stage dir is vacuum fodder (two passes, graced)
    vacuum(root, keep_last=5, grace_seconds=0.0)
    vacuum(root, keep_last=5, grace_seconds=0.0)
    assert len(glob.glob(os.path.join(root, "data", "snap-*"))) == 1
