"""Snapshot-layer schema evolution (VERDICT r7 next-round #3): append
and replace commits may EXTEND the parent schema with new trailing
nullable columns without rewriting a byte — the manifest stores the
superset schema and the pinned-schema read NULL-backfills carried files.
Everything else (drop/reorder/retype) still demands a full overwrite.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    assign_surrogate_keys,
    scd2_merge,
    scd2_merge_cow,
    scd2_merge_mor,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    load_manifest,
    read_snapshot,
    read_table,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"


def test_append_with_new_trailing_column_null_backfills(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(v1, root)
    v2 = spark.createDataFrame(
        [(3, "c", 30.0)], "id long, v string, w double"
    )
    write_snapshot(v2, root, mode="append")

    m = load_manifest(root, 2)
    fields = json.loads(m["schema"])["fields"]
    assert [f["name"] for f in fields] == ["id", "v", "w"]
    assert fields[-1]["nullable"] is True  # forced: carried files lack it

    got = {(r["id"], r["v"], r["w"]) for r in read_table(spark, root).collect()}
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 30.0)}
    # time travel to v1 keeps the old two-column shape
    assert read_snapshot(spark, root, version=1).columns == ["id", "v"]


def test_carried_schema_violations_still_rejected(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, v string"), root
    )
    dropped = spark.createDataFrame([(2,)], "id long")
    reordered = spark.createDataFrame([("b", 2)], "v string, id long")
    retyped = spark.createDataFrame([(2, 3)], "id long, v int")
    for bad in (dropped, reordered, retyped):
        with pytest.raises(ValueError, match="extend the parent"):
            write_snapshot(bad, root, mode="append")
        with pytest.raises(ValueError, match="extend the parent"):
            write_snapshot(
                bad, root, mode="replace", expected_version=1, drop_files=[]
            )
    # nothing committed by the failures
    assert load_manifest(root, 1)["version"] == 1


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("merge_fn", [scd2_merge_cow, scd2_merge_mor])
def test_incremental_evolve_merge_equals_full(spark, tmp_path, merge_fn):
    """The r7 gap: commit() used to reject ANY schema change outside a
    full overwrite, so an evolving dimension forfeited the incremental
    publish exactly when it needed it. Now: publish v1 WITHOUT
    c_nationkey, merge staging (which has it) with evolve_schema=True
    through CoW and MoR — carried files NULL-backfill, and the table is
    row-identical to the full-rewrite evolved merge."""
    root = str(tmp_path / "dim")
    prod = assign_surrogate_keys(
        customer_production(spark, SF).drop("c_nationkey"),
        CUSTOMER_CFG,
        strategy="hash",
    )
    write_snapshot(
        prod.repartitionByRange(8, "c_custkey").sortWithinPartitions(
            "c_custkey"
        ),
        root,
        stats_cols=["c_custkey"],
    )
    # a contiguous sub-range so the CoW variant actually CARRIES files
    # (full fixture staging touches every file); evolve semantics are
    # unaffected by which keys stage
    staging = customer_staging(spark, SF).where(
        F.col("c_custkey").between(100, 160)
    )
    assert staging.count() > 0
    merge_fn(
        spark, root, staging, CUSTOMER_CFG, AS_OF,
        key_strategy="hash", evolve_schema=True,
    )
    got = read_table(spark, root)
    assert "c_nationkey" in got.columns

    expected = scd2_merge(
        read_snapshot(spark, root, version=1),
        staging,
        CUSTOMER_CFG,
        AS_OF,
        key_strategy="hash",
        broadcast_staging=True,
        evolve_schema=True,
    )
    assert _canon(got.select(*expected.columns)) == _canon(expected)

    # untouched v1 files were carried by reference, not rewritten
    m1, m2 = load_manifest(root, 1), load_manifest(root, 2)
    assert set(m1["files"]) & set(m2["files"]), "expected carried files"


def test_change_feed_across_evolved_commit(spark, tmp_path):
    """The version diff must survive a schema-evolved window: the
    pre-evolution side reads the new column as NULL (what it was), so an
    evolved append emits exactly its inserts, a value change against the
    backfill reads as U, and an incompatible overwrite raises the
    re-bootstrap error instead of an analyzer failure."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        changes_since,
        snapshot_changes,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    write_snapshot(
        spark.createDataFrame([(3, "c", 9.0)], "id long, v string, w double"),
        root,
        mode="append",
    )
    ch = snapshot_changes(spark, root, 1, 2, ["id"])
    assert sorted((r["id"], r["op"], r["w"]) for r in ch.collect()) == [
        (3, "I", 9.0)
    ]
    # the poll face spans the evolved window too (signed deltas)
    batch, wm = changes_since(spark, root, 1, ["id"], signed=True)
    assert wm == 2
    assert sorted((r["id"], r["__w"]) for r in batch.collect()) == [(3, 1)]

    # a non-extension rewrite has no coherent diff: clear error
    write_snapshot(
        spark.createDataFrame([(1, 5)], "id long, other int"), root
    )
    with pytest.raises(ValueError, match="re-bootstrap"):
        snapshot_changes(spark, root, 2, 3, ["id"])


def test_metadata_only_evolve_commit_feeds_and_reads(spark, tmp_path):
    """evolve_schema_commit (the ALTER TABLE path) writes no data: the
    new manifest adopts the parent's files with the union schema. The
    change feed across it is EMPTY (no row changed — the new column is
    NULL on both sides of the pinned-schema diff), and subsequent
    appends land in the widened schema."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        evolve_schema_commit,
        snapshot_changes,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(df.coalesce(1), root)
    v2 = evolve_schema_commit(root, [("score", "double")])
    assert v2 == 2
    m2 = load_manifest(root, 2)
    assert m2["files"] == load_manifest(root, 1)["files"]
    assert m2["mode"] == "evolve"
    changes = snapshot_changes(spark, root, 1, 2, ["id"])
    assert changes.count() == 0
    wide = spark.createDataFrame([(3, "c", 1.5)], "id long, v string, score double")
    write_snapshot(wide, root, mode="append")
    got = read_table(spark, root)
    assert sorted(map(tuple, got.collect())) == [
        (1, "a", None), (2, "b", None), (3, "c", 1.5),
    ]
    # duplicate / invalid adds refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exist"):
        evolve_schema_commit(root, [("v", "string")])


def test_evolve_accepts_ddl_and_json_type_names(spark, tmp_path):
    """Self-review r9 (found by the protocol-model extension): the SQL
    face passes catalogString() type names ('int', 'bigint',
    'array<int>') but evolve_schema_commit only accepted schema-JSON
    names — 'ALTER TABLE t ADD COLUMNS (x int)' crashed with an opaque
    CANNOT_PARSE_DATATYPE. Both families parse now; junk types get a
    clear error."""
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql
    from implementing_scds_in_hive_spark.sources.snapshot import (
        evolve_schema_commit,
        read_table,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, v string"), root
    )
    evolve_schema_commit(
        root,
        [("j", "integer"), ("d", "decimal(10,2)"), ("a", "array<int>")],
    )
    rep = run_sql(
        spark,
        "ALTER TABLE t ADD COLUMNS (x int, y bigint, z map<string,int>)",
        {"t": root},
    )
    assert rep["added"] == ["x", "y", "z"]
    got = read_table(spark, root)
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint", "v:string", "j:int", "d:decimal(10,2)",
        "a:array<int>", "x:int", "y:bigint", "z:map<string,int>",
    ]
    assert got.count() == 1  # carried file NULL-backfills every column
    with pytest.raises(ValueError, match="cannot parse column type"):
        evolve_schema_commit(root, [("bad", "noSuchType")])


def test_change_feed_coherent_across_drop_readd_window(spark, tmp_path):
    """r12 review (CONFIRMED live): a DROP + re-ADD of the same logical
    column across the diff window is the coherent diff the equal-schema
    comment documents — but when the schema JSONs differed in any
    incidental bit (a non-nullable v1 field vs the evolve-forced
    nullable re-add), the physical-only prefix compare refused it with
    'incompatible schemas'. The fix matches positional fields by
    physical OR logical name (types must agree): renames keep working,
    drop+re-add windows diff coherently, and genuinely incompatible
    shapes still fail loudly."""
    from pyspark.sql import types as T

    from implementing_scds_in_hive_spark.sources.snapshot import (
        drop_column_commit,
        evolve_schema_commit,
        rename_column_commit,
        snapshot_changes,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("payload", T.StringType(), True),
            T.StructField("x", T.LongType(), False),  # NON-nullable
        ]
    )
    write_snapshot(
        spark.createDataFrame([(1, "p1", 10), (2, "p2", 20)], schema)
        .coalesce(1),
        root,
    )  # v1
    drop_column_commit(root, "x")  # v2
    evolve_schema_commit(root, [("x", "bigint")])  # v3: fresh physical
    # metadata-only window: carried files are byte-shared on both
    # sides, so the coherent diff is EMPTY (Delta CDF semantics for
    # ALTER-only windows) — the r11 code raised instead
    assert snapshot_changes(spark, root, 1, 3, ["k"]).count() == 0

    # a data commit inside the window surfaces through the same pin:
    # the appended key reads the RE-ADDED column's value; carried keys
    # stay silent
    write_snapshot(
        spark.createDataFrame([(3, "p3", 99)], "k long, payload string, x long"),
        root,
        mode="append",
    )  # v4
    rows = sorted(
        map(tuple, snapshot_changes(spark, root, 1, 4, ["k"]).collect())
    )
    assert rows == [(3, "p3", 99, "I")], rows

    # rename across the window stays a no-change diff
    rename_column_commit(root, "payload", "payload2")  # v5
    assert snapshot_changes(spark, root, 4, 5, ["k"]).count() == 0
    # and a genuinely incompatible shape still fails loudly
    root2 = str(tmp_path / "t2")
    write_snapshot(
        spark.createDataFrame([(1, "a", 5)], "k long, a string, b long"),
        root2,
    )
    drop_column_commit(root2, "a")  # (k, b) — positions shift
    evolve_schema_commit(root2, [("c", "string")])  # (k, b, c)
    with pytest.raises(ValueError, match="incompatible schemas"):
        snapshot_changes(spark, root2, 1, 3, ["k"]).count()
