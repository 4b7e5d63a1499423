"""Clustering-decay maintenance (VERDICT r7 next-round #4): repeated
CoW merges rewrite touched files with merged (wider) key ranges until
the stats prune stops biting; ``clustering_overlap`` measures the decay
from the manifest alone and ``maintain_table`` re-clusters past a
threshold, restoring ~one-file point probes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    assign_surrogate_keys,
    scd2_merge_mor,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from implementing_scds_in_hive_spark.sources.sinks import (
    clustering_overlap,
    maintain_table,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    _survives_prune,
    latest_version,
    load_manifest,
    read_table,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"


def _files_for_point_probe(root, key):
    m = load_manifest(root, latest_version(root))
    stats = m.get("stats", {})
    return [
        f
        for f in m["files"]
        if _survives_prune(stats.get(f, {}), {"c_custkey": (key, key)})
    ]


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_scattered_merges_decay_clustering_and_maintenance_restores(
    spark, tmp_path
):
    root = str(tmp_path / "dim")
    prod = assign_surrogate_keys(
        customer_production(spark, SF), CUSTOMER_CFG, strategy="hash"
    )
    write_snapshot(
        prod.repartitionByRange(8, "c_custkey").sortWithinPartitions(
            "c_custkey"
        ),
        root,
        stats_cols=["c_custkey"],
    )
    healthy = clustering_overlap(root, "c_custkey")
    assert healthy is not None and healthy < 2.0

    # key-scattered merge-on-read commits append merge-output files that
    # SPAN the whole key range next to the clustered originals — exactly
    # the decay mode the metric must see. (A CoW merge over a clustered
    # parent largely preserves clustering because each input file maps
    # to an output partition; the MoR tier is where ranges widen.)
    for mod in (3, 5):
        scattered = customer_staging(spark, SF).where(
            (F.col("c_custkey") % 7 == mod) & (F.col("c_custkey") < 1_000_000)
        )
        scd2_merge_mor(spark, root, scattered, CUSTOMER_CFG, AS_OF)
    decayed = clustering_overlap(root, "c_custkey")
    assert decayed > max(2.0, healthy * 2)

    # decay is not just a number: a point probe now opens several files
    # (the key's clustered home file plus every full-range merge file)
    probe_key = scattered.agg(F.min("c_custkey")).first()[0]
    assert len(_files_for_point_probe(root, probe_key)) > 1

    before = _canon(read_table(spark, root))
    rep = maintain_table(
        spark, root, "c_custkey",
        max_vectored_fraction=1.1,  # isolate the clustering policy: the
        # vector-debt fold would rewrite the vectored files first and
        # shift the measured overlap (covered by its own test below)
        target_rows_per_file=30,  # keep several files at fixture scale
        vacuum_grace_seconds=0.0,
    )
    assert rep["reclustered"] is True
    assert rep["overlap"] == pytest.approx(decayed)
    assert rep["overlap_after"] < 2.0
    assert len(load_manifest(root, latest_version(root))["files"]) > 1
    assert len(_files_for_point_probe(root, probe_key)) == 1
    assert _canon(read_table(spark, root)) == before

    # healthy table: the policy loop is a manifest-only no-op
    rep2 = maintain_table(spark, root, "c_custkey", vacuum_grace_seconds=0.0)
    assert rep2 == {
        "folded": False,
        "fold_tier": None,
        "vectored_fraction": 0.0,
        "vector_files": 0,
        "reclustered": False,
        "overlap": rep["overlap_after"],
    }


def test_overlap_none_without_numeric_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,  # no stats_cols recorded
    )
    assert clustering_overlap(root, "id") is None
    rep = maintain_table(spark, root, "id")
    assert rep == {
        "folded": False,
        "fold_tier": None,
        "vectored_fraction": 0.0,
        "vector_files": 0,
        "reclustered": False,
        "overlap": None,
    }


def test_vector_debt_policy_folds_past_threshold(spark, tmp_path):
    """The merge-on-read half of the maintenance loop: MoR merges
    accumulate deletion vectors; past max_vectored_fraction one
    maintenance tick folds them into clean files (content-preserving)
    and the debt metric returns to zero. A healthy table no-ops."""
    from implementing_scds_in_hive_spark.sources.sinks import vector_debt

    root = str(tmp_path / "dim")
    prod = assign_surrogate_keys(
        customer_production(spark, SF), CUSTOMER_CFG, strategy="hash"
    )
    write_snapshot(
        prod.repartitionByRange(4, "c_custkey").sortWithinPartitions(
            "c_custkey"
        ),
        root,
        stats_cols=["c_custkey"],
    )
    debt0 = vector_debt(root)
    assert debt0["vectored_fraction"] == 0.0 and debt0["vector_bytes"] == 0
    rep = maintain_table(spark, root, "c_custkey")
    assert rep["folded"] is False and rep["reclustered"] is False

    # a scattered MoR merge vectors most files
    scattered = customer_staging(spark, SF).where(
        (F.col("c_custkey") % 7 == 3) & (F.col("c_custkey") < 1_000_000)
    )
    scd2_merge_mor(spark, root, scattered, CUSTOMER_CFG, AS_OF)
    debt1 = vector_debt(root)
    assert debt1["vectored_fraction"] > 0.2 and debt1["vector_bytes"] > 0
    before = _canon(read_table(spark, root))

    rep = maintain_table(spark, root, "c_custkey")
    assert rep["folded"] is True
    # r11 review: the data fold retired every live vector — the report
    # must say so (a monitor alerting on vector_files would otherwise
    # fire on a just-folded table)
    assert rep["fold_tier"] == "data"
    assert rep["vector_files"] == 0 and rep["vectored_fraction"] == 0.0
    debt2 = vector_debt(root)
    assert debt2["vectored_fraction"] == 0.0 and debt2["vector_bytes"] == 0
    assert _canon(read_table(spark, root)) == before  # content-preserving

    # below threshold: vectors are left for the next cadence tick
    tiny = customer_staging(spark, SF).orderBy("c_custkey").limit(1)
    scd2_merge_mor(spark, root, tiny, CUSTOMER_CFG, AS_OF)
    assert 0 < vector_debt(root)["vectored_fraction"] <= 0.5
    rep = maintain_table(
        spark, root, "c_custkey", max_vectored_fraction=0.5
    )
    assert rep["folded"] is False
    assert vector_debt(root)["vector_bytes"] > 0


def test_maintenance_commits_carry_app_meta(spark, tmp_path):
    """Self-review r9: content-preserving maintenance (compact_deletes /
    compact_incremental / compact) committed WITHOUT app_meta, silently
    dropping matview watermarks and merge_stream's exactly-once
    stream_txn markers on every OPTIMIZE. All three now carry the
    parent's dict verbatim."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        compact,
        compact_deletes,
        compact_incremental,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    meta = {"watermark": 7, "stream_txn": {"m1": 3}}
    write_snapshot(
        spark.range(200).selectExpr("id", "id * 2 AS v"),
        root,
        stats_cols=["id"],
        app_meta=meta,
    )
    delete_where(spark, root, "id % 5 = 0", tier="mor")
    # since r10 the commit layer carries the parent's app_meta forward
    # on EVERY commit (ADVICE r9 medium) — the DML verb no longer drops
    # it, so the fold sees the metadata without a restoring writer
    assert load_manifest(root, latest_version(root))["app_meta"] == meta
    compact_deletes(spark, root)
    m = load_manifest(root, latest_version(root))
    assert m["app_meta"] == meta and not m.get("deletes")
    compact_incremental(spark, root, min_small_files=2)
    assert load_manifest(root, latest_version(root))["app_meta"] == meta
    compact(spark, root, vacuum_grace_seconds=600.0)
    assert load_manifest(root, latest_version(root))["app_meta"] == meta


def test_maintain_table_folds_on_vector_file_count(spark, tmp_path):
    """scripts/vector_overlay_smoke.py verdict: the overlay bill grows
    ~linearly in DISTINCT VECTOR FILES at fixed vectored fraction, and
    max_vectored_fraction alone scales the allowed count with table
    size — maintain_table therefore folds on a CONSTANT
    max_vector_files bound too."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        maintain_table,
        vector_debt,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(1600)
        .selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .repartitionByRange(16, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    # three DISJOINT small MoR deletes -> three distinct vector files,
    # fraction still low (3/16 < 0.25)
    for i in range(3):
        lo = i * 100
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 100} AND id % 7 = 0",
            tier="mor", prune={"id": (lo, lo + 99)},
        )
    debt = vector_debt(root)
    assert debt["vector_files"] == 3
    assert debt["vectored_fraction"] <= 0.25
    # fraction trigger alone: healthy -> no fold
    rep = maintain_table(
        spark, root, "id",
        max_vectored_fraction=0.25, max_vector_files=None,
    )
    assert rep["folded"] is False and rep["vector_files"] == 3
    # the constant file-count trigger fires — and (r10) takes the
    # vectors-only tier: lists consolidate to one, data files untouched
    rep2 = maintain_table(
        spark, root, "id",
        max_vectored_fraction=0.25, max_vector_files=2,
    )
    assert rep2["folded"] is True and rep2["fold_tier"] == "vectors"
    debt2 = vector_debt(root)
    assert debt2["vector_files"] == 1
    assert debt2["vectored_fraction"] == debt["vectored_fraction"]


def test_consolidate_vectors_folds_lists_without_touching_data(
    spark, tmp_path
):
    """VERDICT r9 next-round #3: the vectors-only fold tier. Disjoint
    small MoR deletes accumulate one vector file per commit (plan-
    branch debt, ~0.13s/file measured); consolidate_vectors must
    collapse them to ONE list per vector schema with every data file
    carried BY REFERENCE — identical content, identical data file
    list, O(vector bytes) work — then no-op on re-run."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        consolidate_vectors,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_snapshot,
        vacuum,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(3200)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(16, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
        app_meta={"watermark": 5},
    )
    for k in range(8):
        lo = k * 400
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 7}", tier="mor"
        )
    m = load_manifest(root, latest_version(root))
    lists = {tuple(r) for r in (m.get("deletes") or {}).values()}
    assert len(lists) == 8, "disjoint commits must accumulate lists"
    before = sorted(map(tuple, read_snapshot(spark, root).collect()))

    res = consolidate_vectors(spark, root)
    assert res["consolidated"]
    assert res["lists_after"] == 1 and res["vector_files_after"] == 1
    m2 = load_manifest(root, latest_version(root))
    assert m2["files"] == m["files"], "data files must be untouched"
    assert m2["app_meta"]["watermark"] == 5, "app_meta carries"
    # ADVICE r10: a vectors-only commit stages no data dir, so the
    # manifest must not carry a phantom never-on-disk snapshot_dir
    import os as _os

    for d in m2["snapshot_dirs"]:
        assert _os.path.isdir(
            _os.path.join(root, d)
        ), f"manifest carries nonexistent dir {d}"
    assert before == sorted(map(tuple, read_snapshot(spark, root).collect()))
    # idempotent: an already-consolidated table burns no version
    v = latest_version(root)
    assert not consolidate_vectors(spark, root)["consolidated"]
    assert latest_version(root) == v
    # the superseded vector files are reclaimable, content survives
    vacuum(root, keep_last=1, grace_seconds=0.0)
    vacuum(root, keep_last=1, grace_seconds=0.0)
    assert before == sorted(map(tuple, read_snapshot(spark, root).collect()))
    # post-consolidation DML still folds prior vectors correctly
    # (id=1000 is alive: the range deletes covered [k*400, k*400+7))
    delete_where(spark, root, "id = 1000", tier="mor")
    assert read_snapshot(spark, root).where("id = 1000").count() == 0
    assert read_snapshot(spark, root).count() == len(before) - 1


def test_consolidate_vectors_groups_by_schema(spark, tmp_path):
    """Vectors from different commits can be keyed differently
    (positional vs full-row); consolidation must merge WITHIN a schema
    group only — one list per schema, never a cross-schema union."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        consolidate_vectors,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(1600)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    # four disjoint commits: two positional, two full-row vectors
    for k, fmt in [(0, "pos"), (1, "pos"), (2, "row"), (3, "row")]:
        lo = k * 400
        delete_where(
            spark,
            root,
            f"id >= {lo} AND id < {lo + 5}",
            tier="mor",
            vector_format=fmt,
        )
    before = sorted(map(tuple, read_snapshot(spark, root).collect()))
    res = consolidate_vectors(spark, root)
    assert res["consolidated"] and res["lists_before"] == 4
    assert res["lists_after"] == 2, "one list per vector schema"
    assert before == sorted(map(tuple, read_snapshot(spark, root).collect()))


def test_maintain_table_routes_count_breach_to_vectors_tier(
    spark, tmp_path
):
    """Policy order (r10): a vector-FILE-count breach with a healthy
    vectored fraction takes the cheap vectors-only fold (fold_tier=
    'vectors', data files untouched); only a fraction breach pays the
    compact_deletes data rewrite (fold_tier='data')."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import maintain_table
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(3200)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(16, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    for k in range(4):
        lo = k * 400
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 5}", tier="mor"
        )
    m = load_manifest(root, latest_version(root))
    # count breach only: 4 vector files > 2, fraction 4/16 < 0.5
    rep = maintain_table(
        spark, root, "id", max_vector_files=2, max_vectored_fraction=0.5
    )
    assert rep["folded"] and rep["fold_tier"] == "vectors"
    m2 = load_manifest(root, latest_version(root))
    assert m2["files"] == m["files"], "vectors tier must not touch data"
    assert m2.get("deletes"), "vectors remain (consolidated), not purged"
    # fraction breach: the data tier purges the vectors entirely
    rep2 = maintain_table(
        spark, root, "id", max_vector_files=32, max_vectored_fraction=0.1
    )
    assert rep2["folded"] and rep2["fold_tier"] == "data"
    assert not load_manifest(root, latest_version(root)).get("deletes")


def test_maintain_table_escalates_when_consolidation_cannot_fold(
    spark, tmp_path
):
    """r10 self-review: when the vector-file-count trigger fires but
    consolidation cannot get under the bound (one bin-packed list per
    SCHEMA, several schemas), maintain_table must escalate to the data
    fold — otherwise the trigger re-fires forever with no remedy."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        maintain_table,
        vector_debt,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(800)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )
    # two vector SCHEMAS on disjoint files: pos and row formats can
    # never merge, so lists can't go below 2
    delete_where(spark, root, "id = 3", tier="mor", vector_format="pos")
    delete_where(spark, root, "id = 403", tier="mor", vector_format="row")
    assert vector_debt(root)["vector_files"] == 2
    rep = maintain_table(
        spark, root, "id", max_vector_files=1, max_vectored_fraction=0.9
    )
    assert rep["folded"] is True and rep["fold_tier"] == "data"
    assert vector_debt(root)["vector_files"] == 0
    got = sorted(r["id"] for r in
                 __import__("implementing_scds_in_hive_spark.sources.snapshot",
                            fromlist=["read_snapshot"]).read_snapshot(
                     spark, root).collect())
    assert 3 not in got and 403 not in got and len(got) == 798


def test_consolidate_vectors_on_mapped_table(spark, tmp_path):
    """r11 review pass #1 (CONFIRMED by reproduction): a vectors-only
    commit stages NO data files and no column_mapping; the stage→commit
    prefix-physical guard must not mistake that for a stale stage and
    abort — consolidation on any table that ever saw a RENAME/DROP
    COLUMN would be permanently broken (the count-cap maintenance tier
    with it)."""
    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.sinks import (
        consolidate_vectors,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_snapshot,
        rename_column_commit,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(1600)
        .selectExpr("id", "id * 2 AS price")
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id"),
        root,
    )
    rename_column_commit(root, "price", "amount")
    for k in range(3):
        lo = k * 400
        delete_where(
            spark, root, f"id >= {lo} AND id < {lo + 7}", tier="mor"
        )
    before = sorted(map(tuple, read_snapshot(spark, root).collect()))
    res = consolidate_vectors(spark, root)
    assert res["consolidated"] and res["vector_files_after"] == 1
    m = load_manifest(root, latest_version(root))
    assert m["column_mapping"] == {"amount": "price"}, (
        "the fold must carry the parent mapping forward"
    )
    assert before == sorted(map(tuple, read_snapshot(spark, root).collect()))
