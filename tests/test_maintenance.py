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
    # the constant file-count trigger fires
    rep2 = maintain_table(
        spark, root, "id",
        max_vectored_fraction=0.25, max_vector_files=2,
    )
    assert rep2["folded"] is True
    assert vector_debt(root)["vector_files"] == 0
