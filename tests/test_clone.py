"""SHALLOW CLONE (r10 late: ``snapshot.clone_table`` + the SQL face's
``CREATE TABLE d SHALLOW CLONE s [VERSION AS OF n]``).

Protocol: the clone's v1 manifest adopts the source version's data
files by ABSOLUTE reference (O(manifest)); deletion vectors — whose
rows embed source-relative paths — are the one materialized part
(O(vector bytes), rewritten with absolute ``__file``). The clone
starts a fresh history, drops source-scoped ``app_meta``, and evolves
independently: local commits add local files, CoW rewrites simply drop
external references, and the clone's VACUUM never touches external
dirs (the sweep skips absolute entries — walking them would compute
../..-style rels that can never match and would DELETE SOURCE DATA).
The Delta caveat carries over: vacuuming the SOURCE past superseded
files breaks the clone loudly.

Reference anchor: the reference's own step 1 is a table clone
(``CREATE TABLE dim_user_new LIKE dim_user_production``,
/root/reference/SCD_script.txt:4); the pinned CTAS is the deep clone,
this is the zero-copy variant.
"""

from __future__ import annotations

import os

import pytest

from implementing_scds_in_hive_spark.operators.dml import (
    delete_where,
    update_where,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    clone_table,
    latest_version,
    load_manifest,
    read_snapshot,
    rename_column_commit,
    vacuum,
    write_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _src(spark, root):
    write_snapshot(
        spark.range(200)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
        app_meta={"stream_txn": {"a": 3}},
    )


def test_clone_is_zero_copy_and_content_identical(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    delete_where(spark, src, "id = 5", tier="mor")  # live vectors travel
    assert clone_table(src, dst) == 1
    m = load_manifest(dst, 1)
    # data files by absolute reference; only vector bytes materialized
    assert all(os.path.isabs(f) for f in m["files"])
    assert m.get("app_meta") is None, "stream markers are source-scoped"
    assert m["cloned_from"]["version"] == 2
    assert _rows(read_snapshot(spark, dst)) == _rows(
        read_snapshot(spark, src)
    )
    # stats travel: the prune still bites through absolute keys
    pruned = read_snapshot(spark, dst, prune={"id": (0, 10)})
    assert 10 <= pruned.count() < 199
    # pinned clone
    dstv1 = str(tmp_path / "dstv1")
    clone_table(src, dstv1, version=1)
    assert read_snapshot(spark, dstv1).count() == 200
    with pytest.raises(ValueError, match="fresh root"):
        clone_table(src, dst)


def test_clone_evolves_independently_and_vacuum_is_safe(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    clone_table(src, dst)
    before_src = _rows(read_snapshot(spark, src))
    # CoW update on the clone rewrites locally, drops external refs
    update_where(spark, dst, {"v": "v + 1"}, "id <= 10", tier="cow")
    assert read_snapshot(spark, dst).where("id = 2").first()["v"] == 5
    assert read_snapshot(spark, src).where("id = 2").first()["v"] == 4
    # MoR delete on the clone (prior-vector folding across the rewrite)
    delete_where(spark, dst, "id = 100", tier="mor")
    assert read_snapshot(spark, dst).count() == 199
    assert read_snapshot(spark, src).count() == 200
    # the clone's aggressive vacuum must NEVER touch source bytes —
    # external dirs are skipped by both sweeps
    vacuum(dst, keep_last=1, grace_seconds=0.0)
    vacuum(dst, keep_last=1, grace_seconds=0.0)
    assert _rows(read_snapshot(spark, src)) == before_src
    assert read_snapshot(spark, dst).count() == 199
    # clone-of-clone: absolute refs copy verbatim
    dst2 = str(tmp_path / "dst2")
    clone_table(dst, dst2)
    assert read_snapshot(spark, dst2).count() == 199
    # maintenance folds work on the clone without touching the source
    from implementing_scds_in_hive_spark.sources.sinks import (
        compact_deletes,
    )

    compact_deletes(spark, dst)
    assert read_snapshot(spark, dst).count() == 199
    assert _rows(read_snapshot(spark, src)) == before_src


def test_clone_of_mapped_table_and_rename_isolation(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    clone_table(src, dst)
    # a source rename after cloning does NOT reach the clone (fresh
    # metadata lineage)...
    rename_column_commit(src, "v", "w")
    assert read_snapshot(spark, dst).columns == ["id", "v"]
    # ...and cloning the MAPPED source serves old physicals via the
    # copied mapping
    dst2 = str(tmp_path / "dst2")
    clone_table(src, dst2)
    c2 = read_snapshot(spark, dst2)
    assert c2.columns == ["id", "w"]
    assert c2.where("id = 2").first()["w"] == 4
    # the clone renames independently of the source
    rename_column_commit(dst2, "w", "x")
    assert read_snapshot(spark, dst2).columns == ["id", "x"]
    assert read_snapshot(spark, src).columns == ["id", "w"]


def test_source_vacuum_breaks_clone_loudly(spark, tmp_path):
    """The documented Delta caveat: the source's vacuum knows nothing
    about clones — once a rewrite supersedes files there and vacuum
    reclaims them, the clone's reads fail LOUDLY (never silently serve
    wrong data)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    clone_table(src, dst)
    update_where(spark, src, {"v": "v"}, "id <= 200", tier="cow")
    vacuum(src, keep_last=1, grace_seconds=0.0)
    vacuum(src, keep_last=1, grace_seconds=0.0)
    with pytest.raises(Exception):
        read_snapshot(spark, dst).count()


def test_sql_face_shallow_clone(spark, tmp_path):
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        query_sql,
        run_sql,
        run_sql_script,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    update_where(spark, src, {"v": "v + 1"}, "id = 0")
    T = {"t": src, "b": dst}
    rep = run_sql(spark, "CREATE TABLE b SHALLOW CLONE t VERSION AS OF 1", T)
    assert rep == {
        "op": "shallow_clone", "source": "t", "target": "b", "version": 1,
    }
    got = query_sql(
        spark, "SELECT v FROM b WHERE id = 0", T
    )
    assert _rows(got) == [(0,)], "pinned clone must hold the v1 value"
    assert latest_version(dst) == 1
    # script-runner routing + DESCRIBE DETAIL of the clone
    dst2 = str(tmp_path / "dst2")
    res = run_sql_script(
        spark,
        "CREATE TABLE c SHALLOW CLONE t; DESCRIBE DETAIL c;",
        {"t": src, "c": dst2},
    )
    assert res[0]["op"] == "shallow_clone"
    assert res[1]["op"] == "describe_detail" and res[1]["num_files"] >= 1


def test_scd_cow_merge_into_a_clone(spark, tmp_path):
    """The reference's OWN workflow is clone-then-merge (SCD_script.txt
    steps 1-8); r10 clone review found scd2_merge_cow reconstructing
    file identity via os.path.relpath, which produced ../...-style
    paths for the clone's absolute external entries and crashed. It
    now uses the exact rel_path_col derivation like the MoR/DML paths;
    the merge must rewrite only the touched external files LOCALLY and
    leave the source byte-identical."""
    from implementing_scds_in_hive_spark.operators.scd import (
        assign_surrogate_keys,
        scd2_merge_cow,
    )
    from implementing_scds_in_hive_spark.plans.scd_fixtures import (
        AS_OF,
        CUSTOMER_CFG,
        customer_production,
        customer_staging,
    )

    sf = "/root/testdata/sf0.001"
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    prod = assign_surrogate_keys(
        customer_production(spark, sf), CUSTOMER_CFG, strategy="hash"
    )
    write_snapshot(
        prod.repartitionByRange(4, "c_custkey").sortWithinPartitions(
            "c_custkey"
        ),
        src,
        stats_cols=["c_custkey"],
    )
    clone_table(src, dst)
    before_src = _rows(read_snapshot(spark, src))
    staging = customer_staging(spark, sf).limit(50)
    rep = scd2_merge_cow(
        spark, dst, staging, CUSTOMER_CFG, AS_OF, key_strategy="hash"
    )
    assert rep["files_rewritten"] >= 1
    assert read_snapshot(spark, dst).count() > len(before_src) - 1
    assert _rows(read_snapshot(spark, src)) == before_src
    # and the clone's vacuum after the merge still leaves source intact
    vacuum(dst, keep_last=1, grace_seconds=0.0)
    vacuum(dst, keep_last=1, grace_seconds=0.0)
    assert _rows(read_snapshot(spark, src)) == before_src


def test_restore_on_clone_does_not_touch_source_markers(spark, tmp_path):
    """r10 clone review: restore_commit cleared dir tombstones and
    .dropped-at markers for every adopted entry — for a clone those
    paths are INSIDE THE SOURCE, so a restore on the clone restarted
    the source vacuum's grace clocks (foreign-storage mutation). It
    now skips absolute entries."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _src(spark, src)
    clone_table(src, dst)
    write_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS v"), dst, mode="append"
    )
    # plant a marker the source's vacuum would own
    m_src = load_manifest(src, latest_version(src))
    victim = os.path.join(src, m_src["files"][0] + ".dropped-at")
    with open(victim, "w") as f:
        f.write("123.0")
    from implementing_scds_in_hive_spark.sources.snapshot import (
        restore_commit,
    )

    restore_commit(dst, 1)
    assert os.path.exists(victim), "clone restore cleared a source marker"
    assert read_snapshot(spark, dst).count() == 200
    os.unlink(victim)


def test_append_only_clone_skips_file_sweep(spark, tmp_path):
    """r10 clone review: clone_table set cow_lineage unconditionally,
    arming the O(files-on-disk) sweep forever on append-only clones.
    The flag now appears only once a replace/vector commit makes
    individually-superseded LOCAL files possible."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_snapshot(spark.range(50).selectExpr("id", "id AS v"), src)
    clone_table(src, dst)
    assert not load_manifest(dst, 1).get("cow_lineage")
    write_snapshot(
        spark.range(50, 60).selectExpr("id", "id AS v"), dst, mode="append"
    )
    assert not load_manifest(dst, latest_version(dst)).get("cow_lineage")
    # a CoW rewrite arms it
    update_where(spark, dst, {"v": "v + 1"}, "id = 55", tier="cow")
    assert load_manifest(dst, latest_version(dst)).get("cow_lineage")


def test_clone_vector_cap_refuses_high_debt(spark, tmp_path):
    """VERDICT r10 #4: the clone's driver-side vector materialization
    is bounded — above max_vector_bytes it refuses loudly and points at
    the source-side fold verbs; after the fold (or with a raised cap)
    the same clone succeeds with identical content."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.snapshot import (
        clone_table,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "src")
    write_snapshot(
        spark.range(2000).selectExpr("id", "id * 2 AS v"), root
    )
    delete_where(spark, root, "id % 3 = 0", tier="mor")
    before = sorted(map(tuple, read_snapshot(spark, root).collect()))

    with pytest.raises(ValueError, match="max_vector_bytes"):
        clone_table(root, str(tmp_path / "c1"), max_vector_bytes=1)
    # the refused clone must not leave a committed table behind
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
    )

    assert latest_version(str(tmp_path / "c1")) is None

    # raised cap (or default): streamed rewrite, identical content
    clone_table(root, str(tmp_path / "c2"))
    got = sorted(
        map(tuple, read_snapshot(spark, str(tmp_path / "c2")).collect())
    )
    assert got == before


def test_maintain_table_on_clone_policy(spark, tmp_path):
    """VERDICT r10 #5: maintenance on a clone. The vectors-only fold
    tier rewrites LOCAL vector files and never touches the source; the
    data fold tier (compact_deletes) LOCALIZES the vectored external
    files — content-preserving, source untouched, the localized files
    become local manifest entries. DESCRIBE DETAIL surfaces the
    external file count/fraction so the user sees the copy bill before
    paying it."""
    import os

    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql
    from implementing_scds_in_hive_spark.sources.sinks import (
        maintain_table,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        clone_table,
        latest_version,
        load_manifest,
        read_snapshot,
        write_snapshot,
    )

    def _listing(p):
        return sorted(
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(p)
            for f in fs
        )

    root = str(tmp_path / "src")
    write_snapshot(
        spark.range(3200)
        .selectExpr("id", "id * 2 AS v", "id % 8 AS bucket")
        .repartition(8, "bucket"),
        root,
        partition_by=["bucket"],
    )
    dst = str(tmp_path / "clone")
    clone_table(root, dst)
    # accumulate vector debt ON THE CLONE (local vectors over external
    # data files)
    for k in range(4):
        delete_where(
            spark, dst, f"bucket = {k} AND id % 5 = 0", tier="mor"
        )
    before = sorted(map(tuple, read_snapshot(spark, dst).collect()))
    src_files = _listing(root)
    d = run_sql(spark, "DESCRIBE DETAIL c", {"c": dst})
    assert d["external_files"] == 8 and d["external_fraction"] == 1.0

    # tier 1: vectors-only fold — local rewrite, source untouched,
    # every data file still external
    res = maintain_table(
        spark, dst, "id", max_vectored_fraction=0.9, max_vector_files=1
    )
    assert res["fold_tier"] == "vectors"
    assert _listing(root) == src_files
    m = load_manifest(dst, latest_version(dst))
    assert all(os.path.isabs(f) for f in m["files"])
    assert sorted(map(tuple, read_snapshot(spark, dst).collect())) == before

    # tier 2: data fold — LOCALIZES exactly the vectored externals
    res2 = maintain_table(
        spark, dst, "id", max_vectored_fraction=0.1, max_vector_files=None
    )
    assert res2["fold_tier"] == "data"
    assert _listing(root) == src_files, "source files must never change"
    m2 = load_manifest(dst, latest_version(dst))
    assert not m2.get("deletes"), "data fold retires the vectors"
    ext = [f for f in m2["files"] if os.path.isabs(f)]
    loc = [f for f in m2["files"] if not os.path.isabs(f)]
    assert len(ext) == 4 and len(loc) >= 1, (
        "only the 4 vectored buckets localize; untouched externals "
        "carry by reference"
    )
    assert sorted(map(tuple, read_snapshot(spark, dst).collect())) == before
    d2 = run_sql(spark, "DESCRIBE DETAIL c", {"c": dst})
    assert d2["external_files"] == 4


def test_clone_distributed_vector_rewrite(spark, tmp_path):
    """VERDICT r10 #4, second option: above the driver cap, a clone
    given a SparkSession rewrites the deletion vectors THROUGH Spark
    (per-schema consolidation, __file rewritten by expression) instead
    of refusing — identical content to the driver-side path, source
    untouched, and the SQL face takes this path transparently."""
    import os

    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql
    from implementing_scds_in_hive_spark.sources.snapshot import (
        clone_table,
        load_manifest,
        read_snapshot,
        write_snapshot,
    )

    def _listing(p):
        return sorted(
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(p)
            for f in fs
        )

    root = str(tmp_path / "src")
    write_snapshot(
        spark.range(2000)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id"),
        root,
    )
    for k in range(3):
        lo = k * 500
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 9}", tier="mor"
        )
    expect = sorted(map(tuple, read_snapshot(spark, root).collect()))
    src_files = _listing(root)

    # driver-path clone (under the default cap) = ground truth
    d1 = str(tmp_path / "driver")
    clone_table(root, d1)
    got1 = sorted(map(tuple, read_snapshot(spark, d1).collect()))
    assert got1 == expect

    # distributed path: cap of 1 byte forces it; spark= enables it
    d2 = str(tmp_path / "dist")
    clone_table(root, d2, max_vector_bytes=1, spark=spark)
    got2 = sorted(map(tuple, read_snapshot(spark, d2).collect()))
    assert got2 == expect
    assert _listing(root) == src_files, "source must be untouched"
    m2 = load_manifest(d2, 1)
    # every vector entry is LOCAL (relative) and every data file is
    # still an absolute reference
    assert all(os.path.isabs(f) for f in m2["files"])
    assert all(
        not os.path.isabs(r)
        for rels in m2["deletes"].values()
        for r in rels
    )
    # hash partitioning on __file puts each served data file's
    # tombstones in EXACTLY ONE output — minimal one-element manifest
    # lists, never the whole group's output set (r11 focused review)
    assert all(len(rels) == 1 for rels in m2["deletes"].values())
    # the clone evolves independently through DML on the rewritten
    # vector overlay (id=100 is alive: the ranges covered [k*500,
    # k*500+9))
    delete_where(spark, d2, "id = 100", tier="mor")
    assert read_snapshot(spark, d2).where("id = 100").count() == 0
    assert read_snapshot(spark, d2).count() == len(expect) - 1

    # past the session broadcast threshold the pair join falls back to
    # a planner-chosen strategy (r11 review: forcing a broadcast on the
    # over-debt path this exists for could OOM executors) — content
    # must be identical either way
    d2b = str(tmp_path / "dist-nobcast")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        clone_table(root, d2b, max_vector_bytes=1, spark=spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert sorted(
        map(tuple, read_snapshot(spark, d2b).collect())
    ) == expect

    # the SQL face passes spark= automatically, so the same high-debt
    # clone succeeds transparently through the textual verb
    d3 = str(tmp_path / "sqlface")
    out = run_sql(
        spark,
        "CREATE TABLE d SHALLOW CLONE s",
        {"s": root, "d": d3},
        max_vector_bytes=1,
    )
    assert out["op"] == "shallow_clone"
    assert sorted(
        map(tuple, read_snapshot(spark, d3).collect())
    ) == expect

def test_clone_failure_leaks_no_vector_dir(spark, tmp_path, monkeypatch):
    """A failure mid-materialization (Spark job loss, coverage check,
    disk full) must not leak the clone's partially-written vector dir:
    dst has no manifest yet so no vacuum can ever reclaim it, and a
    retried clone writes under a fresh writer uuid (r11 review)."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap

    root = str(tmp_path / "src")
    write_snapshot(
        spark.range(100).selectExpr("id", "id * 2 AS v"), root
    )
    delete_where(spark, root, "id < 5", tier="mor")

    # distributed path dies mid-job
    def _boom(*a, **k):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(snap, "_clone_vectors_spark", _boom)
    dst = str(tmp_path / "dst")
    with pytest.raises(RuntimeError, match="executor lost"):
        snap.clone_table(root, dst, max_vector_bytes=1, spark=spark)
    assert not os.path.exists(os.path.join(dst, "data")), (
        "failed distributed rewrite leaked its dv dir"
    )
    assert not os.path.exists(snap._manifest_path(dst, 1))

    # driver path dies mid-rewrite (first pyarrow open)
    import pyarrow.parquet as _pq

    monkeypatch.setattr(_pq, "ParquetFile", _boom)
    dst2 = str(tmp_path / "dst2")
    with pytest.raises(RuntimeError, match="executor lost"):
        snap.clone_table(root, dst2)
    assert not os.path.exists(os.path.join(dst2, "data"))
    # a retry with the fault cleared succeeds into the same dst
    monkeypatch.undo()
    assert snap.clone_table(root, dst2) == 1
    assert read_snapshot(spark, dst2).count() == 95
