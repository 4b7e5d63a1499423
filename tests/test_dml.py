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


def test_auto_caps_mor_at_high_matched_density(spark, tmp_path):
    """ADVICE r8: the auto tier had no upper bound, so a whole-table
    predicate (the SQL face's unqualified UPDATE passes 'true') routed
    to MoR and appended a complete copy of the table plus a tombstone
    per row — strictly worse than CoW, leaving 100% of files carrying
    vector debt. Auto now caps on MATCHED-ROW density (footer counts of
    the touched files): dense → CoW. Crucially the cap is on ROW
    density, not touched-FILE fraction — a scattered sparse predicate
    still touches every file and must stay MoR (the r8 marquee case)."""
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    # whole-table UPDATE: touched fraction 1.0 AND matched density 1.0
    rep = update_where(spark, root, {"o_orderstatus": "'Z'"}, "true")
    assert rep["tier"] == "cow"
    assert not load_manifest(root, latest_version(root)).get("deletes")
    # scattered sparse predicate: touches every file, density ~10% ->
    # stays MoR (no rewrite amplification)
    rep2 = delete_where(spark, root, "o_orderkey % 10 = 3")
    assert rep2["tier"] == "mor"
    assert rep2["files_touched"] == rep2["files_total"]
    # the cap is a knob: loosening it lets the dense predicate stay MoR
    rep3 = update_where(
        spark,
        root,
        {"o_orderstatus": "'Y'"},
        "o_orderkey % 10 <> 3",
        mor_max_matched_fraction=1.01,
        vector_format="pos",
    )
    assert rep3["tier"] == "mor"
    # merge: a source carrying (nearly) every live key routes auto->CoW
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    src = read_table(spark, root).select("o_orderkey").withColumn(
        "price", F.lit(3.0)
    )
    rep4 = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "s.price"},
        when_not_matched_insert=None,
    )
    assert rep4["tier"] == "cow"


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


def test_route_probes_every_vector_file_not_just_first(spark, tmp_path):
    """Self-review r8 (second pass): mixed vector PROVENANCE — one
    touched file carrying a full-row DML vector, another a single-key
    SCD-style vector. A single-file probe that happens to sample the
    full-row vector would mis-route to MoR and then either raise or
    fold null-padded tombstones; the probe must check every distinct
    vector file referenced by the touched set."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    m = load_manifest(root, latest_version(root))
    # full-row vector on the FIRST file (sorts first in the probe) via a
    # real MoR delete confined to that file's key range
    lo, hi = m["stats"][sorted(m["files"])[0]]["o_orderkey"]
    rep = delete_where(
        spark,
        root,
        f"o_orderkey >= {lo} AND o_orderkey <= {lo}",
        tier="mor",
    )
    assert rep["tier"] == "mor" and rep["rows_matched"] >= 1
    # hand-staged single-key (foreign) vector on the LAST file
    m2 = load_manifest(root, latest_version(root))
    last_file = sorted(
        f for f in m2["files"] if "o_orderkey" in m2["stats"].get(f, {})
    )[-1]
    flo, fhi = m2["stats"][last_file]["o_orderkey"]
    tomb = spark.createDataFrame(
        [(last_file, int(fhi))],
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
    before = _rows(read_table(spark, root))
    # predicate touching BOTH vectored files; fraction prefers MoR but
    # the foreign vector on the last file must force CoW
    rep = delete_where(
        spark,
        root,
        "o_orderkey % 2 = 0",
        cow_max_touched_fraction=0.0,
    )
    assert rep["tier"] == "cow"
    expected = [r for r in before if r[0] % 2 != 0]
    assert _rows(read_table(spark, root)) == expected
    # forcing MoR still refuses loudly (per-file schema check)
    _publish(spark, str(tmp_path / "u"), base)


def test_fold_reads_vectors_per_file_list(spark, tmp_path):
    """Self-review r8 (second pass): tombstones for file f fold forward
    from f's OWN manifest vector list. A vector file SHARED with
    another file must not re-apply tombstones that f's re-vectoring
    dropped — the read overlay already resurrects that row, and a DML
    MoR fold must not re-kill it."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base, n_files=2)
    m = load_manifest(root, latest_version(root))
    file_a, file_b = sorted(m["files"])
    full_cols = [f"`{c}`" for c in base.columns]

    def _tomb(pairs):
        # (file, row) pairs -> full-row tombstones
        rows = [(f, *r) for f, r in pairs]
        return spark.createDataFrame(
            rows, f"{DELETE_FILE_COL} string, " + base.schema.simpleString()[7:-1]
        )

    rows_a = base.orderBy("o_orderkey").limit(3).collect()
    rows_b = base.orderBy(F.desc("o_orderkey")).limit(2).collect()
    r1, r3 = tuple(rows_a[0]), tuple(rows_a[1])
    r2 = tuple(rows_b[0])
    victim_a, victim_b = int(rows_a[2][0]), int(rows_b[1][0])
    # v1: ONE vector batch covering A (drops r1) and B (drops r2)
    write_snapshot(
        spark.createDataFrame([], base.schema), root, mode="replace",
        expected_version=latest_version(root), drop_files=[],
        delete_vectors=_tomb([(file_a, r1), (file_b, r2)]).coalesce(1),
    )
    # v2: re-vector ONLY A with {r3}, deliberately NOT carrying r1 — by
    # replace semantics r1 resurrects; r2 stays dead via B's entry in
    # the (still shared) v1 file
    write_snapshot(
        spark.createDataFrame([], base.schema), root, mode="replace",
        expected_version=latest_version(root), drop_files=[],
        delete_vectors=_tomb([(file_a, r3)]).coalesce(1),
    )
    pre = _rows(read_table(spark, root))
    assert r1 in pre and r2 not in pre and r3 not in pre
    # MoR delete matching a live row in EACH file (the old fold's union
    # read needed both touched to leak): A's tombstones must come from
    # v2's list only — r1 must stay alive (it isn't a victim). Format
    # "row" matches the hand-staged priors so the fold runs (a "pos"
    # batch over full-row priors auto-routes/raises instead).
    rep = delete_where(
        spark,
        root,
        f"o_orderkey IN ({victim_a}, {victim_b})",
        tier="mor",
        vector_format="row",
    )
    assert rep["rows_matched"] == 2 and rep["files_touched"] == 2
    post = _rows(read_table(spark, root))
    assert r1 in post, "shared-vector stale tombstone re-applied by fold"
    assert r2 not in post and r3 not in post
    assert post == [r for r in pre if r[0] not in (victim_a, victim_b)]


def test_merge_into_date_keys_with_stats_prune(spark, tmp_path):
    """Self-review r8 (second pass): date/timestamp ON keys — manifest
    footer stats store isoformat strings while the source bounds agg
    yields datetime.date objects; the prune must compare them instead
    of raising TypeError."""
    import datetime as dt

    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    base = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .limit(400)
    )
    write_snapshot(
        base.repartitionByRange(4, "o_orderdate").sortWithinPartitions(
            "o_orderdate"
        ),
        root,
        stats_cols=["o_orderdate"],
    )
    d = base.orderBy("o_orderdate").first()["o_orderdate"]
    src = spark.createDataFrame(
        [(d, 0.5), (dt.date(2099, 1, 1), 2.0)],
        "o_orderdate date, factor double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderdate"],
        when_matched_update={"o_totalprice": "t.o_totalprice * s.factor"},
        when_not_matched_insert=None,
    )
    assert rep["rows_updated"] >= 1
    # bounds spanning min..2099 keep every file a candidate; the join
    # narrows to the files actually containing the matched date
    assert rep["files_candidates"] == rep["files_total"]
    assert rep["files_touched"] < rep["files_total"]
    got = read_table(spark, root)
    exp_sum = base.select(
        F.sum(
            F.when(F.col("o_orderdate") == d, F.col("o_totalprice") * 0.5)
            .otherwise(F.col("o_totalprice"))
        )
    ).first()[0]
    assert abs(got.agg(F.sum("o_totalprice")).first()[0] - exp_sum) < 1e-6
    # a prune-hinted DELETE with raw date bounds works the same way
    rep = delete_where(
        spark,
        root,
        f"o_orderdate = DATE'{d.isoformat()}'",
        prune={"o_orderdate": (d, d)},
    )
    assert rep["files_candidates"] < rep["files_total"]
    assert rep["rows_matched"] >= 1


def test_merge_into_zero_effect_is_noop(spark, tmp_path):
    """Matched keys but no firing clause must NOT burn a version: the
    old path rewrote every touched file byte-identically and woke
    change-feed consumers for an empty diff."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    v_before = latest_version(root)
    k = base.orderBy("o_orderkey").first()["o_orderkey"]
    src = spark.createDataFrame([(int(k),)], "o_orderkey bigint")
    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "t.o_totalprice * 2"},
        update_condition="1 = 0",
        when_not_matched_insert=None,
    )
    assert rep["tier"] == "noop"
    assert rep["rows_updated"] == rep["rows_inserted"] == 0
    assert latest_version(root) == v_before


def test_merge_into_insert_only_is_pure_append(spark, tmp_path):
    """Inserts with zero matched-row effect carry every parent file by
    reference (no CoW rewrite, no vectors) — write volume O(inserts)."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    m_before = load_manifest(root, latest_version(root))
    k = base.orderBy("o_orderkey").first()["o_orderkey"]
    max_key = base.agg(F.max("o_orderkey")).first()[0]
    src = spark.createDataFrame(
        [
            (int(k), int(1), "F", 1.0),  # matches; condition below blocks
            (int(max_key) + 5, int(2), "Z", 2.0),  # new key -> insert
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_update={"o_orderstatus": "s.o_orderstatus"},
        update_condition="1 = 0",
        broadcast_source=False,  # the discovery join must honor this too
    )
    assert rep["tier"] == "append"
    assert rep["rows_inserted"] == 1 and rep["rows_updated"] == 0
    m_after = load_manifest(root, latest_version(root))
    assert set(m_before["files"]) <= set(m_after["files"])  # all carried
    assert not m_after.get("deletes")
    got = read_table(spark, root)
    assert got.count() == base.count() + 1
    assert _rows(got.where(F.col("o_orderkey") <= max_key)) == _rows(base)


def test_positional_dml_sequential_ops_fold_and_stay_narrow(spark, tmp_path):
    """Default-format (positional) MoR DML: sequential DELETE + UPDATE
    on overlapping files fold prior positional vectors forward, the
    staged vector files carry exactly {__file, __pos} (two narrow
    columns however wide the table), and results match the plain
    filter/CASE-WHEN oracle."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        DELETE_POS_COL,
        vector_schemas,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    rep1 = delete_where(spark, root, "o_orderkey % 10 = 3", tier="mor")
    assert rep1["tier"] == "mor" and rep1["rows_matched"] >= 1
    rep2 = update_where(
        spark,
        root,
        {"o_totalprice": "o_totalprice + 1"},
        "o_orderkey % 10 = 4",
        tier="mor",
    )
    assert rep2["tier"] == "mor" and rep2["rows_matched"] >= 1
    expected = sorted(
        (
            r[0],
            r[1],
            r[2],
            r[3] + 1 if r[0] % 10 == 4 else r[3],
        )
        for r in base.collect()
        if r[0] % 10 != 3
    )
    assert _rows(read_table(spark, root)) == expected
    # every live vector file is positional: exactly {__file, __pos}
    m = load_manifest(root, latest_version(root))
    rels = {r for v in m["deletes"].values() for r in v}
    assert rels
    for rel, names in vector_schemas(root, rels).items():
        assert names == {DELETE_FILE_COL, DELETE_POS_COL}, (rel, names)


def test_positional_dml_on_duplicate_rows_matches_predicate_semantics(
    spark, tmp_path
):
    """Duplicate tuples: every copy matches the predicate, so DELETE
    kills them all in both formats — positional tombstones list each
    copy's position explicitly."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    write_snapshot(df.coalesce(1), root)
    rep = delete_where(spark, root, "id = 1", tier="mor")
    assert rep["rows_matched"] == 2
    left = sorted((r["id"], r["v"]) for r in read_table(spark, root).collect())
    assert left == [(2, "b"), (3, "c")]


def test_restore_carries_by_reference_and_survives_vacuum(spark, tmp_path):
    """The default restore is O(manifest): the adopted version's files
    are referenced, not rewritten — zero new data files — and the new
    manifest keeps them alive through a deep vacuum. A second restore
    undoes the first; rewrite=True still materializes."""
    import os as _os

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_snapshot,
        vacuum,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    v1 = latest_version(root)
    m1 = load_manifest(root, v1)
    delete_where(spark, root, "o_totalprice < 100000", tier="mor")
    v2 = latest_version(root)
    n_v2 = read_table(spark, root).count()

    v3 = restore_version(spark, root, v1)
    m3 = load_manifest(root, v3)
    assert m3["files"] == m1["files"]  # adopted, not rewritten
    assert m3["mode"] == "restore"
    assert _rows(read_table(spark, root)) == _rows(base)
    # restore of the MoR state adopts its deletion vectors too
    v4 = restore_version(spark, root, v2)
    assert read_table(spark, root).count() == n_v2
    assert load_manifest(root, v4).get("deletes")
    # back to v1 content, then vacuum everything but the tip: the
    # adopted files must stay live (referenced by the tip manifest)
    restore_version(spark, root, v1)
    vacuum(root, keep_last=1, grace_seconds=0.0)
    assert _rows(read_table(spark, root)) == _rows(base)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=v1)
    # a vacuumed version cannot be restored
    with pytest.raises(FileNotFoundError):
        restore_version(spark, root, v1)
    # rewrite=True re-publishes: brand-new files, same content
    tip = latest_version(root)
    v_new = restore_version(spark, root, tip, rewrite=True)
    m_new = load_manifest(root, v_new)
    assert not set(m_new["files"]) & set(m3["files"])
    assert _rows(read_table(spark, root)) == _rows(base)


def test_restore_cas_conflict(spark, tmp_path):
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
    )

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    v1 = latest_version(root)
    delete_where(spark, root, "o_totalprice < 100000", tier="cow")
    with pytest.raises(CommitConflictError):
        restore_version(spark, root, v1, expected_version=v1)
    assert restore_version(
        spark, root, v1, expected_version=latest_version(root)
    ) == latest_version(root)


def test_update_invalid_set_fails_before_any_scan(spark, tmp_path):
    """Self-review r8 (third pass): an unknown SET column is checkable
    from the manifest schema alone — it must raise before the discovery
    scan reads a byte (pinned via the scan counter)."""
    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, root, {"nope": "1"}, "o_orderkey > 0")
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "validation ran Spark jobs before raising"


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_merge_not_matched_by_source_clauses(spark, tmp_path, tier):
    """WHEN NOT MATCHED BY SOURCE: target rows with no source key are
    deleted / updated by their own clauses, composing with the matched
    clauses and insert in one commit — reference semantics computed
    independently row by row."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    rows = base.collect()
    keys = sorted(r["o_orderkey"] for r in rows)
    src_keys = {k for k in keys if k % 3 == 0}
    max_key = keys[-1]
    src = spark.createDataFrame(
        [(int(k), 7.0) for k in sorted(src_keys)]
        + [(int(max_key) + 11, 99.0)],
        "o_orderkey bigint, price double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "s.price"},
        when_not_matched_insert={"o_orderkey": "s.o_orderkey",
                                 "o_totalprice": "s.price"},
        # unmatched targets: drop the cheap ones, flag the rest
        when_not_matched_by_source_delete="t.o_totalprice < 100000",
        when_not_matched_by_source_update={"o_orderstatus": "'S'"},
        tier=tier,
    )
    assert rep["tier"] == tier
    expected = []
    for r in rows:
        t = tuple(r)
        if r["o_orderkey"] in src_keys:
            expected.append((t[0], t[1], t[2], 7.0))
        elif r["o_totalprice"] < 100000:
            continue  # NBS delete
        else:
            expected.append((t[0], t[1], "S", t[3]))  # NBS update
    expected.append((max_key + 11, None, None, 99.0))
    assert _rows(read_table(spark, root)) == sorted(expected)
    n_del = sum(
        1
        for r in rows
        if r["o_orderkey"] not in src_keys and r["o_totalprice"] < 100000
    )
    n_nbs_upd = sum(
        1
        for r in rows
        if r["o_orderkey"] not in src_keys and r["o_totalprice"] >= 100000
    )
    assert rep["rows_deleted"] == n_del
    assert rep["rows_updated"] == len(src_keys) + n_nbs_upd
    assert rep["rows_inserted"] == 1


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_merge_insert_condition_gates_inserts(spark, tmp_path, tier):
    """``insert_condition`` (WHEN NOT MATCHED AND cond THEN INSERT):
    only unmatched source rows where the condition is TRUE insert —
    FALSE and NULL no-fire (3VL), matched rows are unaffected."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    mk = base.agg(F.max("o_orderkey")).first()[0]
    src = spark.createDataFrame(
        [
            (int(mk) + 1, 5.0),    # inserts (cond TRUE)
            (int(mk) + 2, -1.0),   # cond FALSE
            (int(mk) + 3, None),   # cond NULL -> no-fire
        ],
        "o_orderkey bigint, price double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["o_orderkey"],
        when_not_matched_insert={
            "o_orderkey": "s.o_orderkey",
            "o_totalprice": "s.price",
        },
        insert_condition="s.price > 0",
        tier=tier,
    )
    assert rep["rows_inserted"] == 1
    got = read_table(spark, root).where(f"o_orderkey > {mk}")
    assert _rows(got) == [(mk + 1, None, None, 5.0)]
    with pytest.raises(ValueError, match="insert_condition"):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_matched_delete=True,
            when_not_matched_insert=None,
            insert_condition="s.price > 0",
        )


def test_merge_nbs_rejects_source_references(spark, tmp_path):
    """ADVICE r8: NBS expressions referencing source columns evaluate
    to NULL on unmatched rows — a SET would silently write NULLs.
    Delta/Spark MERGE rejects source references in NBS clauses at
    analysis; ours must raise the same loud error (qualified s.col AND
    an unqualified source-only column), before any scan."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    src = spark.createDataFrame(
        [(1, 7.0)], "o_orderkey bigint, price double"
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE SET"):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_not_matched_by_source_update={"o_totalprice": "s.price"},
        )
    # unqualified reference that only the source can resolve
    with pytest.raises(ValueError, match="references source columns"):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_not_matched_by_source_update={"o_totalprice": "price"},
        )
    # conditions are validated too (3VL would silently no-fire them)
    with pytest.raises(ValueError, match="DELETE condition"):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_not_matched_by_source_delete="s.price < 0",
        )
    assert before == tracker.getJobIdsForGroup(None)
    # target-only expressions (possibly alias-qualified) still pass
    merge_into(
        spark, root, src, ["o_orderkey"],
        when_not_matched_by_source_update={
            "o_totalprice": "t.o_totalprice + 1"
        },
        when_not_matched_insert=None,
    )


def test_sql_merge_not_matched_by_source(spark, tmp_path):
    """The SQL face maps WHEN NOT MATCHED BY SOURCE clauses through."""
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    write_snapshot(df, root)
    src = spark.createDataFrame([(1, 5.0)], "id long, nv double")
    rep = run_sql(
        spark,
        """MERGE INTO t USING s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.nv
           WHEN NOT MATCHED BY SOURCE AND t.v < 25 THEN DELETE
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 1""",
        {"t": root, "s": src},
    )
    assert rep["rows_updated"] == 2 and rep["rows_deleted"] == 1
    assert _rows(read_table(spark, root)) == [(1, 5.0), (3, 31.0)]


def test_nbs_guard_is_case_insensitive(spark, tmp_path):
    """r9 self-review: the NBS source-reference guard compared alias
    and column names case-sensitively while Spark's analyzer resolves
    identifiers case-insensitively — 'S.price' / 'PRICE' bypassed the
    guard and silently wrote NULLs."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    src = spark.createDataFrame([(1, 7.0)], "o_orderkey bigint, price double")
    for expr in ("S.price", "PRICE", "s.PRICE"):
        with pytest.raises(ValueError, match="references source columns"):
            merge_into(
                spark, root, src, ["o_orderkey"],
                when_not_matched_by_source_update={"o_totalprice": expr},
                when_not_matched_insert=None,
            )


def test_merge_expected_version_cas(spark, tmp_path):
    """r9 self-review (merge_stream clobber window): merge_into CASes
    on whatever version it resolves at entry, so a caller who read
    app_meta from version v must pass expected_version=v — a writer
    landing in between now raises CommitConflictError instead of
    having its app_meta silently rebuilt from the stale copy."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
    )

    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    v1 = latest_version(root)
    src = spark.createDataFrame([(1, 7.0)], "o_orderkey bigint, price double")
    # a concurrent writer commits between the app_meta read and the merge
    delete_where(spark, root, "o_orderkey = 2", tier="cow")
    with pytest.raises(CommitConflictError):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_matched_update={"o_totalprice": "s.price"},
            when_not_matched_insert=None,
            expected_version=v1,
        )
    # correct version passes
    merge_into(
        spark, root, src, ["o_orderkey"],
        when_matched_update={"o_totalprice": "s.price"},
        when_not_matched_insert=None,
        expected_version=latest_version(root),
    )


def test_delete_update_carry_app_meta_when_asked(spark, tmp_path):
    """r9 self-review: delete_where/update_where could neither accept
    nor carry app_meta, so ad-hoc DML on a merge_stream target erased
    the exactly-once markers the rest of the diff preserves. Both now
    take app_meta= (the merge_into idiom: caller merges the parent's
    dict in)."""
    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    meta = {"stream_txn": {"m1": 4}}
    delete_where(
        spark, root, "o_orderkey % 2 = 0", tier="mor", app_meta=meta
    )
    assert load_manifest(root, latest_version(root))["app_meta"] == meta
    update_where(
        spark, root, {"o_orderstatus": "'Z'"}, "o_orderkey = 1",
        tier="cow", app_meta=meta,
    )
    assert load_manifest(root, latest_version(root))["app_meta"] == meta

def test_merge_nbs_rejects_resolved_source_column(spark, tmp_path):
    """r11 dml review: a DataFrame-bound Column (src_df["col"]) arrives
    RESOLVED — no UnresolvedAttribute node — and previously bypassed
    the NBS source-reference guard, silently writing NULLs. The guard
    must catch resolved references too."""
    from implementing_scds_in_hive_spark.operators.dml import merge_into

    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    src = spark.createDataFrame(
        [(1, 7.0)], "o_orderkey bigint, price double"
    )
    with pytest.raises(ValueError, match="references source columns"):
        merge_into(
            spark, root, src, ["o_orderkey"],
            when_not_matched_by_source_update={"o_totalprice": src["price"]},
        )


def test_compact_cas_rejects_concurrent_commit(spark, tmp_path, monkeypatch):
    """r11 sinks review: compact() commits the rewrite of the version
    it READ — a concurrent commit landing during the (long) read+
    rewrite window must make it fail with CommitConflictError, not be
    silently clobbered (lost rows + regressed app_meta markers)."""
    import implementing_scds_in_hive_spark.sources.snapshot as snap
    from implementing_scds_in_hive_spark.sources.sinks import compact

    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))

    real = snap.write_snapshot
    hit = {"done": False}

    def _racing(df, r, **kw):
        if not hit["done"] and r == root:
            hit["done"] = True
            # a concurrent writer lands between compact's read and its
            # commit (append one row through the real path)
            real(
                read_table(spark, root).limit(1).selectExpr(
                    "CAST(999999 AS BIGINT) AS o_orderkey", "o_custkey",
                    "o_orderstatus", "o_totalprice",
                ),
                r,
                mode="append",
            )
        return real(df, r, **kw)

    monkeypatch.setattr(snap, "write_snapshot", _racing)
    with pytest.raises(snap.CommitConflictError):
        compact(spark, root, target_rows_per_file=10_000)
    monkeypatch.undo()
    # the concurrent append survived — nothing was clobbered
    assert (
        read_table(spark, root).where("o_orderkey = 999999").count() == 1
    )
