"""Merge-on-read SCD2 merge + deletion-vector protocol (VERDICT r7
next-round #1).

The invariant that makes the tier trustworthy: with a stable key
strategy, ``scd2_merge_mor`` (write ONLY the merge output + per-file key
tombstones, rewrite and drop NOTHING) commits a table ROW-IDENTICAL to
the full-rewrite ``scd2_merge`` over all of production — across Type-1
rewrites, close-outs, version inserts, brand-new keys, NULL keys,
sequential merges whose tombstones must accumulate, and partitioned
tables whose part-file basenames collide (the exact per-file rel-path
fallback). Plus the protocol properties: vectors survive vacuum while
referenced, ``compact_deletes`` folds them away losslessly, and the CAS
discipline rejects concurrent commits.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    assign_surrogate_keys,
    scd2_merge,
    scd2_merge_mor,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from implementing_scds_in_hive_spark.sources.sinks import compact_deletes
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


def _publish_v1(spark, root, strategy="hash", n_files=8, partition_by=None):
    prod = assign_surrogate_keys(
        customer_production(spark, SF), CUSTOMER_CFG, strategy=strategy
    )
    clustered = prod.repartitionByRange(
        n_files, "c_custkey"
    ).sortWithinPartitions("c_custkey")
    return write_snapshot(
        clustered, root, stats_cols=["c_custkey"], partition_by=partition_by
    )


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _full_merge(spark, root, staging, version, strategy="hash"):
    return scd2_merge(
        read_snapshot(spark, root, version=version),
        staging,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy=strategy,
        broadcast_staging=True,
    )


@pytest.mark.parametrize("strategy", ["hash", "md5"])
def test_mor_equals_full_rewrite(spark, tmp_path, strategy):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, strategy=strategy)
    staging = customer_staging(spark, SF)

    rep = scd2_merge_mor(
        spark, root, staging, CUSTOMER_CFG, AS_OF, key_strategy=strategy
    )
    got = read_table(spark, root)
    expected = _full_merge(spark, root, staging, 1, strategy)
    assert _canon(got) == _canon(expected)
    assert rep["version"] == 2
    assert rep["files_tombstoned"] > 0
    assert rep["tombstones"] > 0


def test_mor_scattered_batch_drops_nothing_and_writes_o_batch(spark, tmp_path):
    """The motivating case: a key-SCATTERED small batch (where CoW
    degrades to a full rewrite) commits O(batch) bytes — every parent
    data file is carried untouched, only merge output + tombstone
    vectors are written."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=16)
    m1 = load_manifest(root, 1)
    bytes_table = sum(
        os.path.getsize(os.path.join(root, f)) for f in m1["files"]
    )

    scattered = customer_staging(spark, SF).where(
        (F.col("c_custkey") % 7 == 3) & (F.col("c_custkey") < 1_000_000)
    )
    n_batch = scattered.count()
    assert n_batch > 0

    rep = scd2_merge_mor(spark, root, scattered, CUSTOMER_CFG, AS_OF)
    m2 = load_manifest(root, 2)
    # no parent file dropped or rewritten — the whole point of the tier
    assert set(m1["files"]) <= set(m2["files"])
    assert m2["replaced"] == []
    # scattered keys touch most files...
    assert rep["files_tombstoned"] > len(m1["files"]) // 2
    # ...yet the write volume is O(batch): new data + vector files are a
    # small fraction of the table (CoW would have rewritten ~all of it)
    new_files = set(m2["files"]) - set(m1["files"])
    vec_files = {r for rels in m2.get("deletes", {}).values() for r in rels}
    bytes_new = sum(
        os.path.getsize(os.path.join(root, f)) for f in new_files | vec_files
    )
    assert bytes_new < 0.5 * bytes_table

    expected = _full_merge(spark, root, scattered, 1)
    assert _canon(read_table(spark, root)) == _canon(expected)


def test_mor_sequential_merges_accumulate_tombstones(spark, tmp_path):
    """Second merge re-vectoring a file must FOLD the first merge's
    tombstones forward (a staged vector replaces the parent's), or the
    first batch's superseded rows resurrect."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=4)
    staging = customer_staging(spark, SF).where(F.col("c_custkey") < 1_000_000)
    b1 = staging.where(F.col("c_custkey") % 3 == 0)
    b2 = staging.where(F.col("c_custkey") % 3 == 1)

    scd2_merge_mor(spark, root, b1, CUSTOMER_CFG, AS_OF)
    scd2_merge_mor(spark, root, b2, CUSTOMER_CFG, AS_OF)

    expected = scd2_merge(
        _full_merge(spark, root, b1, 1),
        b2,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy="hash",
        broadcast_staging=True,
    )
    assert _canon(read_table(spark, root)) == _canon(expected)
    # both batches' keys are tombstoned in the v1 files they came from
    m3 = load_manifest(root, 3)
    assert m3.get("deletes"), "expected live vectors after two merges"


def test_mor_on_partitioned_table_with_basename_collisions(spark, tmp_path):
    """A hive-partitioned snapshot produces identical part-file basenames
    across partition dirs (one write task fans across partitions), which
    forces the exact per-file rel-path fallback in both the tombstone
    build and the read overlay."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=2, partition_by=["c_mktsegment"])
    m1 = load_manifest(root, 1)
    bases = [os.path.basename(f) for f in m1["files"]]
    assert len(set(bases)) < len(bases), (
        "fixture regression: expected colliding basenames to exercise "
        "the per-file fallback"
    )

    staging = customer_staging(spark, SF)
    scd2_merge_mor(spark, root, staging, CUSTOMER_CFG, AS_OF)
    expected = _full_merge(spark, root, staging, 1)
    assert _canon(read_table(spark, root)) == _canon(expected)


def test_mor_empty_and_all_null_key_staging(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    staging = customer_staging(spark, SF)

    empty = staging.where(F.lit(False))
    rep = scd2_merge_mor(spark, root, empty, CUSTOMER_CFG, AS_OF)
    assert rep["files_tombstoned"] == 0 and rep["tombstones"] == 0
    assert list_versions(root) == [1]

    key_type = dict(staging.dtypes)["c_custkey"]
    nullkeys = staging.limit(3).withColumn(
        "c_custkey", F.lit(None).cast(key_type)
    )
    rep = scd2_merge_mor(spark, root, nullkeys, CUSTOMER_CFG, AS_OF)
    assert rep["files_tombstoned"] == 0  # NULL keys equi-match nothing
    expected = _full_merge(spark, root, nullkeys, 1)
    assert _canon(read_table(spark, root)) == _canon(expected)


def test_mor_rejects_renumbering_strategies(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    with pytest.raises(ValueError, match="stable key strategy"):
        scd2_merge_mor(
            spark, root, customer_staging(spark, SF), CUSTOMER_CFG, AS_OF,
            key_strategy="two_pass",
        )


def test_mor_cas_conflict_leaves_winner_intact(spark, tmp_path, monkeypatch):
    import implementing_scds_in_hive_spark.operators.scd as scdmod

    root = str(tmp_path / "dim")
    _publish_v1(spark, root)
    real = scdmod.scd2_merge

    def racy(*a, **k):
        # a concurrent writer lands v2 between the manifest load and the
        # merge's replace commit
        monkeypatch.setattr(scdmod, "scd2_merge", real)
        write_snapshot(
            read_snapshot(spark, root, version=1), root, stats_cols=["c_custkey"]
        )
        return real(*a, **k)

    monkeypatch.setattr(scdmod, "scd2_merge", racy)
    with pytest.raises(CommitConflictError):
        scd2_merge_mor(
            spark, root, customer_staging(spark, SF), CUSTOMER_CFG, AS_OF
        )
    assert latest_version(root) == 2  # winner intact, loser left nothing
    # loser's stage dirs are unreferenced orphans; vacuum reclaims them
    vacuum(root, keep_last=5, grace_seconds=0.0)
    vacuum(root, keep_last=5, grace_seconds=0.0)
    live = {
        d
        for v in list_versions(root)
        for d in load_manifest(root, v)["snapshot_dirs"]
    }
    on_disk = {
        os.path.join("data", os.path.basename(p))
        for p in glob.glob(os.path.join(root, "data", "snap-*"))
    }
    assert on_disk == live


def test_compact_deletes_folds_vectors_losslessly(spark, tmp_path):
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=4)
    staging = customer_staging(spark, SF)
    scd2_merge_mor(spark, root, staging, CUSTOMER_CFG, AS_OF)
    before = _canon(read_table(spark, root))
    m2 = load_manifest(root, 2)
    vec_files = {r for rels in m2.get("deletes", {}).values() for r in rels}
    assert vec_files

    rep = compact_deletes(spark, root)
    assert rep["files_folded"] == len(m2.get("deletes", {}))
    m3 = load_manifest(root, rep["version"])
    assert not m3.get("deletes")
    assert _canon(read_table(spark, root)) == before

    # the fold's replace commit drops the (now-contributing-nothing)
    # vector dirs from its manifest, so once v2's manifest is retained
    # out, the whole vector stage dir reclaims two-phase at DIR level
    vec_dirs = {os.path.dirname(vf) for vf in vec_files}
    assert all(d not in m3["snapshot_dirs"] for d in vec_dirs)
    vacuum(root, keep_last=1, grace_seconds=3600.0)  # phase 1: tombstone
    for d in vec_dirs:
        tomb = os.path.join(root, d, ".dropped-at")
        assert os.path.exists(tomb)
        with open(tomb, "w") as f:
            f.write("1.0")  # age past any grace
    out = vacuum(root, keep_last=1, grace_seconds=3600.0)
    assert vec_dirs <= set(out["removed_dirs"])
    for vf in vec_files:
        assert not os.path.exists(os.path.join(root, vf))
    assert _canon(read_table(spark, root)) == before


def test_mor_change_feed_is_exact(spark, tmp_path):
    """A merge-on-read commit changes rows WITHOUT changing carried
    files' bytes — the version diff must still see those rows (vector
    changes make a carried file 'differ'), emitting exactly the U/I/D
    set of the merge."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        snapshot_changes,
    )

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=4)
    staging = customer_staging(spark, SF).where(
        (F.col("c_custkey") % 11 == 5) & (F.col("c_custkey") < 1_000_000)
    )
    scd2_merge_mor(spark, root, staging, CUSTOMER_CFG, AS_OF)

    # diff keyed by surrogate (unique per version-row): U for type-1
    # rewrites never happens under a stable hash key... so key by
    # (c_custkey, scd_version): unique within each version of an SCD2
    # table, stable across the merge for carried rows.
    ch = snapshot_changes(
        spark, root, 1, 2, ["c_custkey", "scd_version"]
    )
    got = {
        (r["c_custkey"], r["scd_version"], r["op"]) for r in ch.collect()
    }
    old = read_snapshot(spark, root, version=1)
    new = read_snapshot(spark, root, version=2)
    o = {(r["c_custkey"], r["scd_version"]): r for r in old.collect()}
    n = {(r["c_custkey"], r["scd_version"]): r for r in new.collect()}
    expected = set()
    for k in o.keys() | n.keys():
        if k not in n:
            expected.add((k[0], k[1], "D"))
        elif k not in o:
            expected.add((k[0], k[1], "I"))
        elif tuple(o[k]) != tuple(n[k]):
            expected.add((k[0], k[1], "U"))
    assert got == expected
    assert expected, "merge should have produced changes"


def test_mor_commit_crash_before_link_leaves_parent_intact(
    spark, tmp_path, monkeypatch
):
    """Crash injection on the MoR commit: before the manifest link the
    parent version is fully readable and BOTH stage dirs (merge output
    + deletion vectors) are unreferenced orphans that vacuum reclaims —
    the commit is atomic or absent, sidecars included."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=4)
    m1 = load_manifest(root, 1)
    before = _canon(read_table(spark, root))

    real_link = os.link

    def boom(*a, **k):
        raise RuntimeError("crash before manifest link")

    monkeypatch.setattr(snap.os, "link", boom)
    with pytest.raises(RuntimeError, match="crash before"):
        scd2_merge_mor(
            spark, root, customer_staging(spark, SF), CUSTOMER_CFG, AS_OF
        )
    monkeypatch.setattr(snap.os, "link", real_link)

    assert list_versions(root) == [1]
    assert _canon(read_table(spark, root)) == before
    # two orphan stage dirs (merge output + vectors); two graced passes
    orphans = {
        os.path.join("data", os.path.basename(p))
        for p in glob.glob(os.path.join(root, "data", "snap-*"))
    } - set(m1["snapshot_dirs"])
    assert len(orphans) == 2
    vacuum(root, keep_last=5, grace_seconds=0.0)
    vacuum(root, keep_last=5, grace_seconds=0.0)
    left = {
        os.path.join("data", os.path.basename(p))
        for p in glob.glob(os.path.join(root, "data", "snap-*"))
    }
    assert left == set(m1["snapshot_dirs"])


def test_mor_upsert_stream_matches_batch_and_folds(spark, tmp_path):
    """Streaming face parity for the merge-on-read tier: per-batch
    staging files land the dimension in exactly the state of sequential
    batch merges; NO initial file is ever dropped mid-stream, and the
    fold_every cadence compacts the accumulated vectors away."""
    from datetime import datetime

    from pyspark.sql import types as T

    from implementing_scds_in_hive_spark.operators.scd import (
        SCDConfig,
        scd2_merge,
    )
    from implementing_scds_in_hive_spark.streaming.scd_stream import (
        scd2_mor_upsert_stream,
    )

    cfg = SCDConfig(
        key="login",
        type2_cols=("address",),
        type1_cols=("name",),
        surrogate_col="dim_id",
    )
    prod_schema = T.StructType(
        [
            T.StructField("dim_id", T.LongType()),
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("scd_version", T.IntegerType()),
            T.StructField("scd_start_date", T.TimestampType()),
            T.StructField("scd_end_date", T.TimestampType()),
            T.StructField("scd_active", T.BooleanType()),
        ]
    )
    t0 = datetime(2024, 1, 1)
    eot = datetime(9999, 12, 31, 23, 59, 59)
    prod_rows = [
        (None, f"u{i:02d}", f"a{i}", f"N{i}", 1, t0, eot, True)
        for i in range(40)
    ]
    prod = assign_surrogate_keys(
        spark.createDataFrame(prod_rows, prod_schema), cfg, strategy="hash"
    )
    root = str(tmp_path / "dim")
    write_snapshot(
        prod.repartitionByRange(8, "login").sortWithinPartitions("login"),
        root, stats_cols=["login"],
    )
    m1_files = set(load_manifest(root, 1)["files"])

    stg_schema = T.StructType(
        [
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("batch_ts", T.TimestampType()),
        ]
    )
    # scattered keys across both batches (u05 / u25 / u38 span the file
    # range); batch 1 re-touches u05 (tombstone accumulation on its file)
    batches = [
        [("u05", "a5-new", "N5", t0), ("u25", "a25-new", "N25", t0),
         ("u99", "a99", "N99", t0)],
        [("u05", "a5-newer", "N5", t0), ("u38", "a38-new", "N38", t0)],
    ]
    stg_dir = str(tmp_path / "staging_stream")
    for chunk in batches:
        spark.createDataFrame(chunk, stg_schema).coalesce(1).write.mode(
            "append"
        ).parquet(stg_dir)

    as_of = {0: datetime(2024, 2, 1), 1: datetime(2024, 3, 1)}
    stream = (
        spark.readStream.schema(stg_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stg_dir)
    )
    q = scd2_mor_upsert_stream(
        stream,
        root,
        cfg,
        checkpoint_dir=str(tmp_path / "ckpt"),
        order_by=["batch_ts"],
        as_of_fn=lambda b: as_of[b],
        retain_versions=None,  # keep every version for the audit
        fold_every=2,  # second batch triggers an inline fold
    )
    q.awaitTermination(120)

    def batch_apply(order):
        cur = prod
        for i in order:
            stg = spark.createDataFrame(batches[i], stg_schema).drop(
                "batch_ts"
            )
            cur = scd2_merge(cur, stg, cfg, as_of[i], key_strategy="hash",
                             broadcast_staging=True)
        return _canon(cur.select(*[f.name for f in prod_schema.fields]))

    got = _canon(
        read_table(spark, root).select(*[f.name for f in prod_schema.fields])
    )
    assert got in (batch_apply([0, 1]), batch_apply([1, 0]))

    # MoR file economy: both merge versions CARRY every initial file
    for v in (2, 3):
        assert m1_files <= set(load_manifest(root, v)["files"])
    assert load_manifest(root, 2).get("deletes")  # vectors after batch 0
    # batch 1 hit fold_every=2: the final version is folded clean
    final = load_manifest(root, latest_version(root))
    assert not final.get("deletes")


def test_incremental_router_picks_tier_by_candidate_fraction(
    spark, tmp_path
):
    """scd2_merge_incremental: clustered batches route to CoW (few
    stats-prune candidates), scattered batches to MoR (no rewrite
    amplification); both land the identical row set, and forced tiers
    and empty staging behave."""
    from implementing_scds_in_hive_spark.operators.scd import (
        scd2_merge_incremental,
    )

    staging_all = customer_staging(spark, SF).where(
        F.col("c_custkey") < 1_000_000
    )

    # clustered contiguous range -> CoW
    root = str(tmp_path / "dim_clustered")
    _publish_v1(spark, root, n_files=16)
    clustered = staging_all.where(F.col("c_custkey").between(100, 115))
    rep = scd2_merge_incremental(
        spark, root, clustered, CUSTOMER_CFG, AS_OF
    )
    assert rep["tier"] == "cow" and "files_rewritten" in rep
    expected = _full_merge(spark, root, clustered, 1)
    assert _canon(read_table(spark, root)) == _canon(expected)

    # scattered -> MoR, no parent file dropped
    root2 = str(tmp_path / "dim_scattered")
    _publish_v1(spark, root2, n_files=16)
    scattered = staging_all.where(F.col("c_custkey") % 7 == 3)
    rep2 = scd2_merge_incremental(
        spark, root2, scattered, CUSTOMER_CFG, AS_OF
    )
    assert rep2["tier"] == "mor" and rep2["tombstones"] > 0
    m1 = load_manifest(root2, 1)
    assert set(m1["files"]) <= set(load_manifest(root2, 2)["files"])
    expected2 = _full_merge(spark, root2, scattered, 1)
    assert _canon(read_table(spark, root2)) == _canon(expected2)

    # forced tier overrides the signal; result identical either way
    root3 = str(tmp_path / "dim_forced")
    _publish_v1(spark, root3, n_files=16)
    rep3 = scd2_merge_incremental(
        spark, root3, clustered, CUSTOMER_CFG, AS_OF, tier="mor"
    )
    assert rep3["tier"] == "mor"
    assert _canon(read_table(spark, root3)) == _canon(
        _full_merge(spark, root3, clustered, 1)
    )

    # empty staging: routed nowhere, table untouched
    rep4 = scd2_merge_incremental(
        spark, root3, staging_all.where(F.lit(False)), CUSTOMER_CFG, AS_OF
    )
    assert rep4["tier"] == "noop"
    with pytest.raises(ValueError, match="tier must be"):
        scd2_merge_incremental(
            spark, root3, clustered, CUSTOMER_CFG, AS_OF, tier="bogus"
        )


def test_incremental_router_falls_back_to_cow_on_legacy_vectors(
    spark, tmp_path
):
    """ADVICE r8: the auto router decided cow/mor from the candidate
    fraction alone — auto-routing to MoR over touched files carrying
    legacy KEY vectors raised the compact-first ValueError mid-pipeline
    (failing scheduled maintainers instead of doing the work). The auto
    branch now mirrors dml._route's footer probe: incompatible prior
    vectors route to CoW, which retires them with their files. A FORCED
    mor tier still raises — explicit asks stay loud."""
    from implementing_scds_in_hive_spark.operators.scd import (
        scd2_merge_incremental,
    )

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=16)
    staging_all = customer_staging(spark, SF).where(
        F.col("c_custkey") < 1_000_000
    )
    scattered = staging_all.where(F.col("c_custkey") % 7 == 3)
    # leave legacy single-key vectors on most files
    rep1 = scd2_merge_mor(
        spark, root, scattered, CUSTOMER_CFG, AS_OF, vector_format="key"
    )
    assert rep1["files_tombstoned"] > 0
    v2 = latest_version(root)
    # a second scattered batch would route mor — but its positional
    # vectors can't fold into the key vectors: auto falls back to cow
    scattered2 = staging_all.where(F.col("c_custkey") % 7 == 5)
    rep2 = scd2_merge_incremental(
        spark, root, scattered2, CUSTOMER_CFG, AS_OF
    )
    assert rep2["tier"] == "cow"
    expected = _full_merge(spark, root, scattered2, v2)
    assert _canon(read_table(spark, root)) == _canon(expected)
    # matching format still auto-routes mor (fold is compatible)
    scattered3 = staging_all.where(F.col("c_custkey") % 7 == 1)
    rep3 = scd2_merge_incremental(
        spark, root, scattered3, CUSTOMER_CFG, AS_OF, vector_format="key"
    )
    assert rep3["tier"] == "mor"
    # forced mor with the incompatible format raises loudly
    with pytest.raises(ValueError, match="compact_deletes"):
        scd2_merge_incremental(
            spark,
            root,
            staging_all.where(F.col("c_custkey") % 7 == 2),
            CUSTOMER_CFG,
            AS_OF,
            tier="mor",
        )


def test_protocol_model_property_with_deletion_vectors(spark, tmp_path):
    """Model-based check of the protocol WITH the r8 merge-on-read ops:
    any chain of overwrite / append / key-delete (deletion-vector
    replace commit with prior-vector accumulation) / positional delete
    (the DML verb, compact-then-retry when key vectors block the fold)
    / carry-by-reference restore / ZERO-REWRITE SCHEMA EVOLUTION (r9,
    VERDICT r8 next-round #8) / fold / vacuum keeps read_table() equal
    to a trivial in-memory model (id multiset + evolved-column list),
    with time travel consistent for every retained version. Evolution
    composes with everything else in the chain: restore ACROSS a schema
    change reverts to the historical schema (restore-of-restore too),
    appends after an evolve carry the widened schema, MoR deletes and
    folds run over NULL-backfilled carried files, vacuum interleaves
    anywhere."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    def _df(spark, rows, extra_cols=()):
        df = spark.createDataFrame(
            [(int(i), f"v{i}") for i in rows], "id long, v string"
        )
        for c in extra_cols:
            df = df.withColumn(c, F.lit(None).cast("string"))
        return df

    rows_strategy = st.lists(
        st.integers(min_value=0, max_value=29), min_size=1, max_size=5
    )
    keys_strategy = st.lists(
        st.integers(min_value=0, max_value=29), min_size=1, max_size=4,
        unique=True,
    )
    op_strategy = st.one_of(
        st.tuples(st.just("overwrite"), rows_strategy),
        st.tuples(st.just("append"), rows_strategy),
        st.tuples(st.just("delete"), keys_strategy),
        st.tuples(st.just("pos_delete"), keys_strategy),
        st.tuples(st.just("restore"), st.integers(min_value=0, max_value=7)),
        st.tuples(st.just("evolve"), st.none()),
        st.tuples(st.just("fold"), st.none()),
        st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=3)),
    )
    counter = [0]

    def delete_keys(root, keys):
        """Generic keyed delete via the deletion-vector commit: tombstone
        every (file, id) pair holding one of ``keys``, folding prior
        vectors for the re-vectored files forward (replace semantics)."""
        import os as _os

        v = latest_version(root)
        m = load_manifest(root, v)
        rows = read_manifest_files(
            spark, root, m, m["files"], rel_path_col="__rel"
        )
        hits = rows.where(F.col("id").isin(list(keys))).select(
            F.col("__rel").alias("__file"), "id"
        )
        touched = sorted(
            r["__file"] for r in hits.select("__file").distinct().collect()
        )
        if not touched:
            return False
        tomb = hits.distinct()
        prior_rels = sorted(
            {r for f in touched for r in m.get("deletes", {}).get(f, [])}
        )
        if prior_rels:
            prior = spark.read.parquet(
                *[_os.path.join(root, p) for p in prior_rels]
            ).where(F.col("__file").isin(touched))
            tomb = tomb.unionByName(prior.select("__file", "id"))
        import json as _json

        from pyspark.sql.types import StructType

        # the replace commit's schema must match the CURRENT manifest
        # (which may carry evolved-in columns), not the seed schema
        empty = spark.createDataFrame(
            [], StructType.fromJson(_json.loads(m["schema"]))
        )
        write_snapshot(
            empty, root, mode="replace", expected_version=v,
            drop_files=[], delete_vectors=tomb,
        )
        return True

    @settings(
        max_examples=5, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture,
                               HealthCheck.too_slow],
    )
    @given(ops=st.lists(op_strategy, min_size=2, max_size=5))
    def run(ops):
        counter[0] += 1
        root = str(tmp_path / f"model_{counter[0]}")
        write_snapshot(
            _df(spark, [0, 1, 2]).repartition(2), root
        )
        model = [0, 1, 2]
        extra: list[str] = []  # evolved-in columns at HEAD
        n_evolved = [0]
        history = {latest_version(root): (sorted(model), tuple(extra))}
        for op, arg in ops:
            if op == "overwrite":
                write_snapshot(_df(spark, arg, extra), root)
                model = list(arg)
            elif op == "append":
                write_snapshot(
                    _df(spark, arg, extra), root, mode="append"
                )
                model = model + list(arg)
            elif op == "delete":
                delete_keys(root, arg)
                model = [x for x in model if x not in set(arg)]
            elif op == "pos_delete":
                from implementing_scds_in_hive_spark.operators.dml import (
                    delete_where,
                )
                from implementing_scds_in_hive_spark.sources.sinks import (
                    compact_deletes,
                )

                pred = "id IN (" + ",".join(map(str, arg)) + ")"
                try:
                    delete_where(spark, root, pred, tier="mor")
                except ValueError:
                    # key vectors on touched files can't fold into a
                    # positional batch — the documented remedy, then retry
                    compact_deletes(spark, root)
                    delete_where(spark, root, pred, tier="mor")
                model = [x for x in model if x not in set(arg)]
            elif op == "restore":
                from implementing_scds_in_hive_spark.operators.dml import (
                    restore_version,
                )

                vs = list_versions(root)
                target = vs[arg % len(vs)]
                restore_version(spark, root, target)
                model = list(history[target][0])
                extra = list(history[target][1])
            elif op == "evolve":
                from implementing_scds_in_hive_spark.sources.snapshot import (
                    evolve_schema_commit,
                )

                n_evolved[0] += 1
                name = f"e{n_evolved[0]}"
                evolve_schema_commit(root, [(name, "string")])
                extra = extra + [name]
            elif op == "fold":
                from implementing_scds_in_hive_spark.sources.sinks import (
                    compact_deletes,
                )

                compact_deletes(spark, root)  # content-preserving
            elif op == "vacuum":
                vacuum(root, keep_last=arg, grace_seconds=3600.0)
            history[latest_version(root)] = (sorted(model), tuple(extra))
            head = read_table(spark, root)
            assert head.columns == ["id", "v", *extra], (
                f"after {op}({arg}): schema {head.columns}"
            )
            got = sorted(r["id"] for r in head.collect())
            assert got == sorted(model), (
                f"after {op}({arg}): {got} != {sorted(model)}"
            )
            if extra:
                # carried (pre-evolve) files NULL-backfill every evolved
                # column; appended post-evolve rows wrote literal NULLs
                assert head.where(
                    F.col(extra[-1]).isNotNull()
                ).count() == 0
        for v in list_versions(root):
            if v in history:
                pin = read_snapshot(spark, root, version=v)
                ids, cols = history[v]
                assert pin.columns == ["id", "v", *cols], f"schema v{v}"
                tv = sorted(r["id"] for r in pin.collect())
                assert tv == ids, f"time travel v{v}"

    run()


def test_restore_evolve_directed_chain(spark, tmp_path):
    """Directed companion to the model property (VERDICT r8 #8 names
    these compositions explicitly, so they must not depend on what
    hypothesis happens to sample): evolve -> MoR delete over the
    NULL-backfilled carried files -> restore ACROSS the schema change
    (schema reverts) -> restore-of-restore (back to the evolved+deleted
    state) -> vacuum interleaved -> a second evolve on the restored
    lineage."""
    from implementing_scds_in_hive_spark.operators.dml import (
        delete_where,
        restore_version,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        evolve_schema_commit,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    write_snapshot(df.repartition(2), root)  # v1: 2-col schema
    evolve_schema_commit(root, [("e1", "string")])  # v2: +e1, zero bytes
    got = read_table(spark, root)
    assert got.columns == ["id", "v", "e1"]
    assert got.where(F.col("e1").isNotNull()).count() == 0
    # MoR delete over NULL-backfilled carried files (pos vectors)
    delete_where(spark, root, "id % 3 = 0", tier="mor")  # v3
    assert sorted(
        r["id"] for r in read_table(spark, root).collect()
    ) == [1, 2, 4, 5, 7, 8]
    # restore ACROSS the schema change: v1's 2-col schema comes back
    restore_version(spark, root, 1)  # v4
    got = read_table(spark, root)
    assert got.columns == ["id", "v"] and got.count() == 10
    # restore-of-restore: back to the evolved + vectored state (the
    # adopted manifest carries BOTH the schema and the live vectors)
    restore_version(spark, root, 3)  # v5
    got = read_table(spark, root)
    assert got.columns == ["id", "v", "e1"]
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 4, 5, 7, 8]
    # vacuum interleaves (grace keeps the carried files alive)
    vacuum(root, keep_last=2, grace_seconds=3600.0)
    assert read_table(spark, root).count() == 6
    # a second evolve on the restored lineage
    evolve_schema_commit(root, [("e2", "int")])  # v6
    got = read_table(spark, root)
    assert got.columns == ["id", "v", "e1", "e2"]
    # pinned reads keep every historical schema
    assert read_snapshot(spark, root, version=4).columns == ["id", "v"]
    assert read_snapshot(spark, root, version=5).columns == [
        "id", "v", "e1",
    ]


def test_cow_after_mor_interleave(spark, tmp_path):
    """The tiers compose: a CoW merge over a table carrying deletion
    vectors reads touched files through the overlay (live rows only),
    drops them (their vectors die with them), and carries untouched
    files WITH their vectors — sequential full merges are the oracle."""
    from implementing_scds_in_hive_spark.operators.scd import scd2_merge_cow

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=8)
    staging = customer_staging(spark, SF).where(F.col("c_custkey") < 1_000_000)
    scattered = staging.where(F.col("c_custkey") % 7 == 3)
    clustered = staging.where(F.col("c_custkey").between(100, 130))

    scd2_merge_mor(spark, root, scattered, CUSTOMER_CFG, AS_OF)
    scd2_merge_cow(spark, root, clustered, CUSTOMER_CFG, AS_OF)

    expected = scd2_merge(
        _full_merge(spark, root, scattered, 1),
        clustered,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy="hash",
        broadcast_staging=True,
    )
    assert _canon(read_table(spark, root)) == _canon(expected)


def test_pruned_read_applies_vectors_to_surviving_files(spark, tmp_path):
    """read_snapshot(prune=...) on a vectored table: the overlay applies
    to exactly the files that survive the prune — skipped vectored files
    cost nothing, surviving ones still hide their tombstoned rows."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=8)
    staging = customer_staging(spark, SF).where(
        (F.col("c_custkey") % 7 == 3) & (F.col("c_custkey") < 1_000_000)
    )
    scd2_merge_mor(spark, root, staging, CUSTOMER_CFG, AS_OF)

    lo, hi = 0, 20  # a sliver of the fixture's ~0..150 key span
    pruned = read_snapshot(
        spark, root, prune={"c_custkey": (lo, hi)}
    ).where(F.col("c_custkey").between(lo, hi))
    full = read_table(spark, root).where(
        F.col("c_custkey").between(lo, hi)
    )
    assert _canon(pruned) == _canon(full)
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_mor_stream_replay_after_post_publish_crash(spark, tmp_path):
    """The at-least-once window: a crash AFTER the merge commit but
    BEFORE the checkpoint records the batch replays the same batch on
    restart. With stable keys and a deterministic per-batch as_of the
    replay re-tombstones and rewrites IDENTICAL row content — the table
    equals the single-application state (content-level idempotence)."""
    from datetime import datetime

    from pyspark.sql import types as T

    from implementing_scds_in_hive_spark.operators.scd import SCDConfig
    from implementing_scds_in_hive_spark.streaming.scd_stream import (
        scd2_mor_upsert_stream,
    )

    cfg = SCDConfig(
        key="login", type2_cols=("address",), type1_cols=("name",),
        surrogate_col="dim_id",
    )
    prod_schema = T.StructType(
        [
            T.StructField("dim_id", T.LongType()),
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("scd_version", T.IntegerType()),
            T.StructField("scd_start_date", T.TimestampType()),
            T.StructField("scd_end_date", T.TimestampType()),
            T.StructField("scd_active", T.BooleanType()),
        ]
    )
    t0 = datetime(2024, 1, 1)
    eot = datetime(9999, 12, 31, 23, 59, 59)
    prod = assign_surrogate_keys(
        spark.createDataFrame(
            [(None, f"u{i}", f"a{i}", f"N{i}", 1, t0, eot, True)
             for i in range(20)],
            prod_schema,
        ),
        cfg,
        strategy="hash",
    )
    root = str(tmp_path / "dim")
    write_snapshot(
        prod.repartitionByRange(4, "login").sortWithinPartitions("login"),
        root, stats_cols=["login"],
    )

    stg_schema = "login string, address string, name string"
    stg_dir = str(tmp_path / "staging_stream")
    spark.createDataFrame(
        [("u3", "a3-new", "N3"), ("u17", "a17-new", "N17")], stg_schema
    ).coalesce(1).write.parquet(stg_dir)
    ckpt = str(tmp_path / "ckpt")
    as_of_fn = lambda b: datetime(2024, 2, 1)  # noqa: E731

    def crash(batch_id, phase):
        if phase == "post_publish":
            raise RuntimeError("injected crash after commit")

    q = scd2_mor_upsert_stream(
        spark.readStream.schema(stg_schema).parquet(stg_dir),
        root, cfg, checkpoint_dir=ckpt, as_of_fn=as_of_fn,
        retain_versions=None, crash_hook=crash,
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
    assert latest_version(root) == 2  # the merge DID commit
    state_after_crash = _canon(read_table(spark, root))

    # restart, same checkpoint, no hook: the batch replays
    q2 = scd2_mor_upsert_stream(
        spark.readStream.schema(stg_schema).parquet(stg_dir),
        root, cfg, checkpoint_dir=ckpt, as_of_fn=as_of_fn,
        retain_versions=None,
    )
    q2.awaitTermination(120)
    assert latest_version(root) >= 3  # replay committed again...
    assert _canon(read_table(spark, root)) == state_after_crash  # ...idempotently


def test_mor_fold_reads_vectors_per_file_list(spark, tmp_path):
    """Self-review r8 (second pass, SCD tier): tombstones for file f
    fold forward from f's OWN manifest vector list. A vector file
    SHARED with another file must not re-apply tombstones that f's
    re-vectoring dropped — the read overlay already resurrects that
    key, and the merge's fold must not re-kill it."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=2)
    m1 = load_manifest(root, 1)
    file_a, file_b = sorted(m1["files"], key=lambda f: m1["stats"][f]["c_custkey"][0])
    rng_a = m1["stats"][file_a]["c_custkey"]
    rng_b = m1["stats"][file_b]["c_custkey"]
    prod = read_snapshot(spark, root, version=1)
    ktype = dict(prod.dtypes)["c_custkey"]
    stag = customer_staging(spark, SF)
    skeys = {r[0] for r in stag.select("c_custkey").distinct().collect()}
    pkeys_a = sorted(
        r[0]
        for r in prod.where(
            (F.col("c_custkey") >= rng_a[0]) & (F.col("c_custkey") <= rng_a[1])
        )
        .select("c_custkey")
        .distinct()
        .collect()
    )
    # staged keys (merge will touch both files through them) ...
    k_a3 = next(k for k in sorted(skeys) if rng_a[0] <= k <= rng_a[1])
    k_b2 = next(k for k in sorted(skeys) if rng_b[0] <= k <= rng_b[1])
    # ... and vectored keys that the merge does NOT stage
    k_a1, k_a2 = [k for k in pkeys_a if k != k_a3][:2]
    k_b = next(
        r[0]
        for r in prod.where(
            (F.col("c_custkey") >= rng_b[0]) & (F.col("c_custkey") != k_b2)
        )
        .select("c_custkey")
        .distinct()
        .orderBy("c_custkey")
        .limit(1)
        .collect()
    )
    empty = spark.createDataFrame([], prod.schema)
    # v2: ONE shared vector file covering A (kills k_a1) and B (kills k_b)
    write_snapshot(
        empty, root, mode="replace", expected_version=1, drop_files=[],
        delete_vectors=spark.createDataFrame(
            [(file_a, int(k_a1)), (file_b, int(k_b))],
            f"{DELETE_FILE_COL} string, c_custkey {ktype}",
        ).coalesce(1),
    )
    # v3: re-vector ONLY A with {k_a2}, deliberately dropping k_a1 — by
    # replace semantics k_a1 resurrects; k_b stays dead via B's entry in
    # the (still shared) v2 vector file
    write_snapshot(
        empty, root, mode="replace", expected_version=2, drop_files=[],
        delete_vectors=spark.createDataFrame(
            [(file_a, int(k_a2))],
            f"{DELETE_FILE_COL} string, c_custkey {ktype}",
        ).coalesce(1),
    )
    pre = read_table(spark, root)
    assert pre.where(F.col("c_custkey") == k_a1).count() >= 1
    assert pre.where(F.col("c_custkey").isin([int(k_a2), int(k_b)])).count() == 0
    # MoR merge touching BOTH files: A's fold must use v3's list only —
    # k_a1 (unstaged) must stay alive
    batch = stag.where(F.col("c_custkey").isin([int(k_a3), int(k_b2)]))
    assert batch.count() >= 1
    # format "key" matches the hand-staged priors so the fold runs (a
    # positional batch over key vectors auto-raises the compact-first
    # error instead of folding)
    scd2_merge_mor(
        spark, root, batch, CUSTOMER_CFG, AS_OF, vector_format="key"
    )
    got = read_table(spark, root)
    assert got.where(F.col("c_custkey") == k_a1).count() >= 1, (
        "shared-vector stale tombstone re-applied by the SCD MoR fold"
    )
    assert got.where(F.col("c_custkey").isin([int(k_a2), int(k_b)])).count() == 0
    expected = _full_merge(spark, root, batch, 3)
    assert _canon(got) == _canon(expected)


def test_mor_key_format_still_row_identical(spark, tmp_path):
    """The legacy single-key vector format stays supported and exact
    (one tombstone per (file, staged key), all versions killed)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        vector_schemas,
    )

    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=4)
    staging = customer_staging(spark, SF).where(
        F.col("c_custkey") % 5 == 2
    )
    rep = scd2_merge_mor(
        spark, root, staging, CUSTOMER_CFG, AS_OF, vector_format="key"
    )
    assert rep["tombstones"] >= 1
    expected = _full_merge(spark, root, staging, 1)
    assert _canon(read_table(spark, root)) == _canon(expected)
    m2 = load_manifest(root, 2)
    rels = {r for v in m2["deletes"].values() for r in v}
    for _rel, names in vector_schemas(root, rels).items():
        assert names == {"__file", "c_custkey"}


def test_mor_pos_after_key_needs_compaction_then_succeeds(spark, tmp_path):
    """Format interop: a positional merge over files still carrying key
    vectors raises the compact-first error (the formats cannot fold
    into one batch); after compact_deletes retires the key vectors, the
    positional merge lands and stays row-identical."""
    root = str(tmp_path / "dim")
    _publish_v1(spark, root, n_files=2)
    staging = customer_staging(spark, SF).where(F.col("c_custkey") < 1_000_000)
    b1 = staging.where(F.col("c_custkey") % 3 == 0)
    b2 = staging.where(F.col("c_custkey") % 3 == 1)
    scd2_merge_mor(spark, root, b1, CUSTOMER_CFG, AS_OF, vector_format="key")
    with pytest.raises(ValueError, match="compact_deletes"):
        scd2_merge_mor(
            spark, root, b2, CUSTOMER_CFG, AS_OF, vector_format="pos"
        )
    compact_deletes(spark, root)
    v = latest_version(root)
    scd2_merge_mor(spark, root, b2, CUSTOMER_CFG, AS_OF, vector_format="pos")
    expected = scd2_merge(
        read_snapshot(spark, root, version=v),
        b2,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy="hash",
        broadcast_staging=True,
    )
    assert _canon(read_table(spark, root)) == _canon(expected)
