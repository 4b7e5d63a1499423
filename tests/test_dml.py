"""Generic row-level DML on snapshot tables (operators/dml.py):
DELETE WHERE / UPDATE SET ... WHERE through both publish tiers, plus
RESTORE.

Trust anchor: for ANY deterministic predicate, both tiers must commit a
table row-identical to the plain DataFrame filter / CASE-WHEN rewrite
of the pre-DML read — including 3VL (NULL predicate rows are KEPT
unchanged, as in ANSI DELETE/UPDATE), duplicate rows (full-row
tombstones delete every copy of a matching tuple, which is exactly
DELETE's semantics since duplicates of a matching row also match),
sequential operations whose vectors must fold forward, and interop
with the SCD merge tiers' single-key vectors (incompatible vectors
route auto to CoW; forced MoR raises the compact-first error).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dml import (
    delete_where,
    restore_version,
    update_where,
)
from implementing_scds_in_hive_spark.sources.sinks import compact_deletes
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    load_manifest,
    read_table,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"


def _orders(spark, with_nulls=False):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(600)
    )
    if with_nulls:
        # a NULL-predicate stripe: status NULL makes most predicates NULL
        df = df.withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
                F.col("o_orderstatus")
            ),
        )
    return df


def _publish(spark, root, df, n_files=6):
    return write_snapshot(
        df.repartitionByRange(n_files, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        root,
        stats_cols=["o_orderkey"],
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_delete_where_matches_plain_filter(spark, tmp_path, tier):
    root = str(tmp_path / "t")
    base = _orders(spark, with_nulls=True)
    _publish(spark, root, base)
    pred = "o_orderstatus = 'F' AND o_totalprice < 150000"
    rep = delete_where(spark, root, pred, tier=tier)
    assert rep["tier"] == tier and rep["rows_matched"] > 0
    # ANSI 3VL: NULL-status rows are kept (predicate NULL, not TRUE)
    expected = base.where(~F.coalesce(F.expr(pred), F.lit(False)))
    assert _rows(read_table(spark, root)) == _rows(expected)
    if tier == "mor":
        m = load_manifest(root, latest_version(root))
        assert m.get("deletes"), "merge-on-read delete must record vectors"
        assert rep["files_touched"] == len(m["deletes"])
    else:
        assert not load_manifest(root, latest_version(root)).get("deletes")


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_update_where_matches_case_when(spark, tmp_path, tier):
    root = str(tmp_path / "t")
    base = _orders(spark, with_nulls=True)
    _publish(spark, root, base)
    pred = "o_totalprice > 200000"
    rep = update_where(
        spark,
        root,
        {"o_orderstatus": "'X'", "o_totalprice": "o_totalprice * 0.5"},
        pred,
        tier=tier,
    )
    assert rep["tier"] == tier and rep["rows_matched"] > 0
    hit = F.coalesce(F.expr(pred), F.lit(False))
    expected = base.select(
        "o_orderkey",
        "o_custkey",
        F.when(hit, F.lit("X")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(hit, F.col("o_totalprice") * 0.5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    assert _rows(read_table(spark, root)) == _rows(expected)


def test_delete_duplicates_and_sequential_vector_fold(spark, tmp_path):
    """Full-row tombstones delete EVERY copy of a matching tuple, and a
    second MoR delete folds the first's vectors forward instead of
    resurrecting its rows."""
    root = str(tmp_path / "t")
    base = _orders(spark)
    dup = base.unionByName(base.where("o_orderkey % 5 = 0"))  # real dups
    _publish(spark, root, dup)
    delete_where(spark, root, "o_orderkey % 5 = 0", tier="mor")
    got1 = read_table(spark, root)
    assert got1.where("o_orderkey % 5 = 0").count() == 0
    delete_where(spark, root, "o_totalprice < 50000", tier="mor")
    got2 = read_table(spark, root)
    expected = base.where("o_orderkey % 5 <> 0 AND o_totalprice >= 50000")
    assert _rows(got2) == _rows(expected)


def test_noop_and_prune_and_routing(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    v = latest_version(root)
    rep = delete_where(spark, root, "o_orderkey < 0")
    assert rep["tier"] == "noop" and latest_version(root) == v
    # stats prune narrows candidates driver-side before any scan
    lo = base.agg(F.min("o_orderkey")).first()[0]
    rep = delete_where(
        spark,
        root,
        f"o_orderkey = {lo}",
        prune={"o_orderkey": (lo, lo)},
        tier="auto",
    )
    assert rep["files_candidates"] < rep["files_total"]
    assert rep["tier"] == "cow" and rep["files_touched"] == 1
    # a scattered predicate touches every file -> auto routes to MoR
    rep = update_where(
        spark, root, {"o_custkey": "o_custkey"}, "o_orderkey % 2 = 1"
    )
    assert rep["tier"] == "mor"


def test_auto_falls_back_to_cow_over_foreign_vectors(spark, tmp_path):
    """Touched files carrying vectors a full-row batch cannot fold
    (different column set — here a hand-staged single-key vector) route
    auto to CoW; forcing MoR raises the compact-first error."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    m = load_manifest(root, latest_version(root))
    victim_key = base.orderBy("o_orderkey").first()["o_orderkey"]
    tomb = spark.createDataFrame(
        [(m["files"][0], int(victim_key))],
        f"{DELETE_FILE_COL} string, o_orderkey bigint",
    )
    write_snapshot(
        spark.createDataFrame([], base.schema),
        root,
        mode="replace",
        expected_version=latest_version(root),
        drop_files=[],
        delete_vectors=tomb,
    )
    # forcing the incompatible tier must refuse loudly, not silently
    # resurrect rows through an unfoldable vector
    with pytest.raises(ValueError, match="compact_deletes"):
        update_where(
            spark,
            root,
            {"o_orderstatus": "'Z'"},
            "o_orderkey % 2 = 0",
            tier="mor",
        )
    rep = delete_where(
        spark, root, "o_orderkey % 2 = 1", cow_max_touched_fraction=0.0
    )
    assert rep["tier"] == "cow"  # fraction said mor; vectors forced cow
    assert not load_manifest(root, latest_version(root)).get("deletes")


def test_update_unknown_column_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, root, {"nope": "1"}, "o_orderkey > 0")


def test_mor_then_compact_then_cow_roundtrip(spark, tmp_path):
    """The maintenance story end-to-end: MoR delete -> compact_deletes
    folds vectors into clean files -> CoW update over the folded table
    stays row-exact."""
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    delete_where(spark, root, "o_orderkey % 3 = 0", tier="mor")
    compact_deletes(spark, root)
    assert not load_manifest(root, latest_version(root)).get("deletes")
    update_where(
        spark, root, {"o_orderstatus": "'W'"}, "o_totalprice > 100000",
        tier="cow",
    )
    expected = base.where("o_orderkey % 3 <> 0").select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_totalprice") > 100000, F.lit("W"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    assert _rows(read_table(spark, root)) == _rows(expected)


def test_restore_version_rolls_forward(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    v1 = latest_version(root)
    delete_where(spark, root, "o_totalprice < 100000", tier="cow")
    assert read_table(spark, root).count() < base.count()
    v3 = restore_version(spark, root, v1)
    assert v3 == latest_version(root) and v3 > v1
    assert _rows(read_table(spark, root)) == _rows(base)
    m = load_manifest(root, v3)
    assert m["app_meta"] == {"restored_from_version": v1}
    # history preserved: the deleted state is still readable
    assert read_table(spark, root, version=v3 - 1).count() < base.count()


# --- merge_into ---------------------------------------------------------


def _merge_expected(base, src_rows, spark):
    """Reference semantics computed independently: delete F-status
    matches, halve matched prices otherwise, insert new keys."""
    src = {r[0]: r for r in src_rows}
    out = []
    for row in base.collect():
        s = src.get(row["o_orderkey"])
        if s is None:
            out.append(tuple(row))
        elif row["o_orderstatus"] == "F":
            continue  # deleted
        else:
            out.append(
                (row["o_orderkey"], row["o_custkey"], s[1], row["o_totalprice"] * 0.5)
            )
    for k, status, price in [r for r in src_rows if r[0] not in {
        row["o_orderkey"] for row in base.collect()
    }]:
        out.append((k, -1, status, price))
    return sorted(out)


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_merge_into_all_three_clauses(spark, tmp_path, tier):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    keys = [r["o_orderkey"] for r in base.orderBy("o_orderkey").limit(40).collect()]
    max_key = base.agg(F.max("o_orderkey")).first()[0]
    src_rows = [(int(k), "M", 123.0) for k in keys] + [
        (int(max_key + i), "N", float(i)) for i in (1, 2, 3)
    ]
    src = spark.createDataFrame(
        src_rows, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_delete="t.o_orderstatus = 'F'",
        when_matched_update={
            "o_orderstatus": "s.o_orderstatus",
            "o_totalprice": "t.o_totalprice * 0.5",
        },
        when_not_matched_insert={
            "o_orderkey": "s.o_orderkey",
            "o_custkey": "-1",
            "o_orderstatus": "s.o_orderstatus",
            "o_totalprice": "s.o_totalprice",
        },
        tier=tier,
    )
    assert rep["tier"] == tier
    assert rep["rows_inserted"] == 3
    assert rep["rows_deleted"] + rep["rows_updated"] == 40
    expected = _merge_expected(base, src_rows, spark)
    assert _rows(read_table(spark, root)) == expected


def test_merge_into_insert_all_and_pure_insert(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    max_key = base.agg(F.max("o_orderkey")).first()[0]
    src = spark.createDataFrame(
        [(int(max_key + 10), int(7), "Z", 1.5)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    rep = merge_into(spark, root, src, ["o_orderkey"])  # insert="all" only
    assert rep["rows_inserted"] == 1 and rep["rows_updated"] == 0
    assert rep["files_touched"] == 0  # new key is outside every file's stats
    got = read_table(spark, root)
    assert got.count() == base.count() + 1
    assert got.where(F.col("o_orderkey") == max_key + 10).first()[
        "o_orderstatus"
    ] == "Z"


def test_merge_into_validations(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    k = base.first()["o_orderkey"]
    dup = spark.createDataFrame(
        [(int(k), 1.0), (int(k), 2.0)], "o_orderkey bigint, o_totalprice double"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(
            spark, root, dup, ["o_orderkey"],
            when_matched_update={"o_totalprice": "s.o_totalprice"},
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="at least one WHEN"):
        merge_into(spark, root, dup, ["o_orderkey"],
                   when_not_matched_insert=None)
    with pytest.raises(ValueError, match="ON key"):
        merge_into(
            spark, root, dup.limit(1), ["o_orderkey"],
            when_matched_update={"o_orderkey": "0"},
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="missing"):
        merge_into(spark, root, dup.limit(1), ["o_orderkey"])  # "all" short


def test_merge_into_null_keys_and_3vl(spark, tmp_path):
    """NULL source keys match nothing (inserted); a NULL update
    condition keeps the row unchanged."""
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    k = base.orderBy("o_orderkey").first()["o_orderkey"]
    src = spark.createDataFrame(
        [(int(k), None), (None, 9.0)],
        "o_orderkey bigint, adj double",
    )
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "t.o_totalprice + s.adj"},
        update_condition="s.adj IS NOT NULL AND s.adj > 0",
        when_not_matched_insert={
            "o_orderkey": "coalesce(s.o_orderkey, -7)",
            "o_orderstatus": "'NULLKEY'",
        },
    )
    assert rep["rows_updated"] == 0  # condition NULL/False -> no update
    assert rep["rows_inserted"] == 1  # the NULL-key source row
    got = read_table(spark, root)
    assert got.where("o_orderkey = -7").first()["o_orderstatus"] == "NULLKEY"
    # the matched row is byte-identical
    orig = base.where(F.col("o_orderkey") == k).first()
    assert got.where(F.col("o_orderkey") == k).first()["o_totalprice"] == orig["o_totalprice"]
