"""Textual SQL face (operators/sql_dml.py): every statement must be
row-identical to calling the underlying verb directly — the statement
is parsed by SPARK'S parser and the clause expressions are replayed
through Catalyst (`Expression.sql()` -> `F.expr`), so this suite pins
the statement-shape mapping, not expression semantics (those are the
verbs' suites).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.sql_dml import run_sql
from implementing_scds_in_hive_spark.sources.snapshot import (
    latest_version,
    load_manifest,
    read_snapshot,
    read_table,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )


def _publish(spark, root, df, n_files=4):
    return write_snapshot(
        df.repartitionByRange(n_files, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        root,
        stats_cols=["o_orderkey"],
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_delete_matches_filter(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    rep = run_sql(
        spark,
        "DELETE FROM orders WHERE o_orderstatus = 'F' AND o_totalprice < 150000",
        {"orders": root},
    )
    assert rep["op"] == "delete" and rep["rows_matched"] > 0
    expected = base.where(
        ~F.coalesce(
            F.expr("o_orderstatus = 'F' AND o_totalprice < 150000"),
            F.lit(False),
        )
    )
    assert _rows(read_table(spark, root)) == _rows(expected)


def test_sql_update_matches_case_when_and_passes_opts(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    rep = run_sql(
        spark,
        "UPDATE orders SET o_totalprice = o_totalprice * 2, o_orderstatus = 'Z' "
        "WHERE o_orderkey % 3 = 0",
        {"orders": root},
        tier="mor",
    )
    assert rep["op"] == "update" and rep["tier"] == "mor"
    hit = F.coalesce(F.expr("o_orderkey % 3 = 0"), F.lit(False))
    expected = base.select(
        "o_orderkey",
        "o_custkey",
        F.when(hit, F.lit("Z")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(hit, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    assert _rows(read_table(spark, root)) == _rows(expected)


def test_sql_update_without_where_touches_all(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    write_snapshot(df, root)
    run_sql(spark, "UPDATE t SET v = v + 1", {"t": root})
    assert _rows(read_table(spark, root)) == [(1, 2.0), (2, 3.0)]


def test_sql_merge_full_three_clause_with_user_aliases(spark, tmp_path):
    """Arbitrary MERGE aliases flow through target_alias/source_alias;
    update + conditional update + delete + insert clauses all land."""
    root = str(tmp_path / "t")
    base = _orders(spark)
    _publish(spark, root, base)
    ks = [r[0] for r in base.orderBy("o_orderkey").limit(3).collect()]
    max_key = base.agg(F.max("o_orderkey")).first()[0]
    src = spark.createDataFrame(
        [
            (int(ks[0]), 111.0, "del"),
            (int(ks[1]), 222.0, "upd"),
            (int(max_key) + 7, 333.0, "ins"),
        ],
        "k bigint, price double, action string",
    )
    rep = run_sql(
        spark,
        """MERGE INTO orders AS tgt USING src AS stg ON tgt.o_orderkey = stg.k
           WHEN MATCHED AND stg.action = 'del' THEN DELETE
           WHEN MATCHED THEN UPDATE SET o_totalprice = stg.price
           WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice)
               VALUES (stg.k, stg.price)""",
        {"orders": root, "src": src},
    )
    assert rep["op"] == "merge"
    assert (
        rep["rows_deleted"],
        rep["rows_updated"],
        rep["rows_inserted"],
    ) == (1, 1, 1)
    got = read_table(spark, root)
    assert got.where(F.col("o_orderkey") == ks[0]).count() == 0
    assert got.where(F.col("o_orderkey") == ks[1]).first()[
        "o_totalprice"
    ] == 222.0
    ins = got.where(F.col("o_orderkey") == max_key + 7).first()
    assert ins["o_totalprice"] == 333.0 and ins["o_orderstatus"] is None
    assert got.count() == base.count()  # -1 del +1 ins


def test_sql_merge_source_can_be_snapshot_root(spark, tmp_path):
    root = str(tmp_path / "t")
    sroot = str(tmp_path / "s")
    base = _orders(spark)
    _publish(spark, root, base)
    k = int(base.orderBy("o_orderkey").first()["o_orderkey"])
    write_snapshot(
        spark.createDataFrame([(k, 9.5)], "o_orderkey bigint, f double"),
        sroot,
    )
    rep = run_sql(
        spark,
        "MERGE INTO t USING s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET o_totalprice = s.f",
        {"t": root, "s": sroot},
    )
    assert rep["rows_updated"] == 1
    assert (
        read_table(spark, root)
        .where(F.col("o_orderkey") == k)
        .first()["o_totalprice"]
        == 9.5
    )


def test_sql_merge_rejects_non_equi_on(spark, tmp_path):
    root = str(tmp_path / "t")
    _publish(spark, root, _orders(spark))
    src = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="equalities"):
        run_sql(
            spark,
            "MERGE INTO t USING s ON t.o_orderkey > s.k "
            "WHEN MATCHED THEN DELETE",
            {"t": root, "s": src},
        )
    # a differently-named source key is fine (projected onto the
    # target's name) — UNLESS the source already has a column by the
    # target key's name, which would be ambiguous
    src2 = spark.createDataFrame([(1, 2)], "k bigint, o_orderkey bigint")
    with pytest.raises(ValueError, match="rename one to disambiguate"):
        run_sql(
            spark,
            "MERGE INTO t USING s ON t.o_orderkey = s.k "
            "WHEN MATCHED THEN DELETE",
            {"t": root, "s": src2},
        )


def test_sql_insert_values_select_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(df, root)
    rep = run_sql(
        spark, "INSERT INTO t VALUES (3, 'c'), (4, 'd')", {"t": root}
    )
    assert rep == {"op": "insert", "mode": "append", "version": 2}
    assert _rows(read_table(spark, root)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]
    # explicit column list: unnamed columns insert NULL
    run_sql(spark, "INSERT INTO t (id) VALUES (5)", {"t": root})
    assert (5, None) in _rows(read_table(spark, root))
    # INSERT ... SELECT over another registered table
    root2 = str(tmp_path / "u")
    write_snapshot(
        spark.createDataFrame([(9, "z")], "id long, v string"), root2
    )
    run_sql(
        spark,
        "INSERT INTO t SELECT id + 100, upper(v) FROM u",
        {"t": root, "u": root2},
    )
    assert (109, "Z") in _rows(read_table(spark, root))
    # OVERWRITE replaces content in one atomic commit
    run_sql(spark, "INSERT OVERWRITE t VALUES (7, 'only')", {"t": root})
    assert _rows(read_table(spark, root)) == [(7, "only")]


def test_sql_restore_vacuum_optimize(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    write_snapshot(df, root)
    run_sql(spark, "INSERT INTO t VALUES (2, 'b')", {"t": root})
    rep = run_sql(
        spark, "RESTORE TABLE t TO VERSION AS OF 1", {"t": root}
    )
    assert rep["op"] == "restore" and rep["version"] == 3
    assert _rows(read_table(spark, root)) == [(1, "a")]
    # MoR delete leaves vectors; OPTIMIZE t APPLY (PURGE) folds them
    run_sql(spark, "INSERT INTO t VALUES (2, 'b'), (3, 'c')", {"t": root})
    run_sql(
        spark, "DELETE FROM t WHERE id = 2", {"t": root}, tier="mor"
    )
    assert load_manifest(root, latest_version(root)).get("deletes")
    rep = run_sql(spark, "OPTIMIZE t APPLY (PURGE)", {"t": root})
    assert rep["op"] == "optimize" and rep["files_folded"] >= 1
    assert not load_manifest(root, latest_version(root)).get("deletes")
    assert _rows(read_table(spark, root)) == [(1, "a"), (3, "c")]
    # VACUUM with RETAIN 0 HOURS drops history beyond keep_last
    run_sql(spark, "VACUUM t RETAIN 0 HOURS", {"t": root}, keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)
    assert _rows(read_table(spark, root)) == [(1, "a"), (3, "c")]


def test_sql_unknown_table_and_statement_kind(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame([(1,)], "id long"), root)
    with pytest.raises(KeyError, match="register its snapshot root"):
        run_sql(spark, "DELETE FROM nope WHERE id = 1", {"t": root})
    with pytest.raises(ValueError, match="unsupported statement kind"):
        run_sql(spark, "SELECT 1", {"t": root})


def test_sql_alter_add_columns_and_describe_history(spark, tmp_path):
    """ALTER TABLE ADD COLUMNS evolves the schema with a zero-rewrite
    empty append (carried files NULL-backfill); DESCRIBE HISTORY
    surfaces the retained commit chain."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(df.coalesce(1), root)
    m1 = load_manifest(root, 1)
    rep = run_sql(
        spark,
        "ALTER TABLE t ADD COLUMNS (score double, note string)",
        {"t": root},
    )
    assert rep["op"] == "add_columns" and rep["added"] == ["score", "note"]
    m2 = load_manifest(root, rep["version"])
    assert m2["files"] == m1["files"]  # zero rewrite
    got = read_table(spark, root)
    assert got.columns == ["id", "v", "score", "note"]
    assert _rows(got) == [(1, "a", None, None), (2, "b", None, None)]
    # the new column is immediately writable through the SQL face
    run_sql(
        spark,
        "UPDATE t SET score = id * 1.5 WHERE id = 2",
        {"t": root},
    )
    assert _rows(read_table(spark, root)) == [
        (1, "a", None, None),
        (2, "b", 3.0, None),
    ]
    with pytest.raises(ValueError, match="already exist"):
        run_sql(spark, "ALTER TABLE t ADD COLUMNS (id long)", {"t": root})
    h = run_sql(spark, "DESCRIBE HISTORY t", {"t": root})["history"]
    assert [e["version"] for e in h] == [1, 2, 3]
    assert h[1]["mode"] == "evolve"  # v2 was the ALTER; v3 the UPDATE


def test_sql_insert_preserves_users_temp_view(spark, tmp_path):
    """Self-review r8 (third pass): run_sql INSERT must not destroy a
    pre-existing session temp view whose name collides with a
    registered table — it is saved and restored."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, v string"), root
    )
    mine = spark.createDataFrame([(99,)], "marker long")
    mine.createOrReplaceTempView("t")
    try:
        run_sql(spark, "INSERT INTO t VALUES (2, 'b')", {"t": root})
        assert _rows(read_table(spark, root)) == [(1, "a"), (2, "b")]
        # the user's view survived, un-rebound
        assert spark.sql("SELECT * FROM t").collect()[0]["marker"] == 99
    finally:
        spark.catalog.dropTempView("t")


def test_sql_insert_rejects_duplicate_column_list(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, v string"), root
    )
    with pytest.raises(ValueError, match="repeats columns"):
        run_sql(spark, "INSERT INTO t (id, id) VALUES (1, 2)", {"t": root})


def test_sql_qualified_set_keys_resolve(spark, tmp_path):
    """Self-review r8 (third pass): 'SET t.col = ...' is legal SQL —
    the qualifier resolves when it names the statement's own table or
    alias; a foreign qualifier refuses loudly (the old .sql()-strip
    mangled '`t`.`v`' into a nonsense column name)."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
    )
    run_sql(spark, "UPDATE t SET t.v = t.v + 10 WHERE id = 1", {"t": root})
    assert _rows(read_table(spark, root)) == [(1, 11.0), (2, 2.0)]
    with pytest.raises(ValueError, match="must be a column of the target"):
        run_sql(spark, "UPDATE t SET other.v = 1", {"t": root})
    # MERGE with alias-qualified SET keys
    src = spark.createDataFrame([(2, 5.0)], "id long, nv double")
    run_sql(
        spark,
        "MERGE INTO t AS tg USING s ON tg.id = s.id "
        "WHEN MATCHED THEN UPDATE SET tg.v = s.nv",
        {"t": root, "s": src},
    )
    assert _rows(read_table(spark, root)) == [(1, 11.0), (2, 5.0)]


def test_sql_create_table_as_select(spark, tmp_path):
    """CTAS publishes version 1 of a NEW snapshot root (partitioned
    form included); an existing table refuses."""
    src_root = str(tmp_path / "src")
    write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, grp string, v double",
        ),
        src_root,
    )
    dst = str(tmp_path / "dst")
    rep = run_sql(
        spark,
        "CREATE TABLE agg PARTITIONED BY (grp) AS "
        "SELECT grp, SUM(v) AS total FROM src GROUP BY grp",
        {"src": src_root, "agg": dst},
    )
    assert rep == {"op": "create_table", "version": 1, "partition_by": ["grp"]}
    got = read_table(spark, dst)
    assert sorted(map(tuple, got.collect())) == [("a", 40.0), ("b", 20.0)]
    assert load_manifest(dst, 1)["partition_by"] == ["grp"]
    # the new table is immediately writable through the face
    run_sql(spark, "DELETE FROM agg WHERE total > 30", {"agg": dst})
    assert sorted(map(tuple, read_table(spark, dst).collect())) == [("b", 20.0)]
    with pytest.raises(ValueError, match="already exists"):
        run_sql(
            spark,
            "CREATE TABLE agg AS SELECT 1 AS x",
            {"agg": dst},
        )


def test_sql_merge_first_match_wins_clause_order(spark, tmp_path):
    """Self-review r8 (fourth pass): SQL MERGE applies the FIRST
    matching clause in textual order. UPDATE listed before an
    unconditional DELETE must claim its rows — the engine's
    delete-first evaluation is remapped by restricting the delete to
    rows the update does not claim."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ),
        root,
    )
    src = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    rep = run_sql(
        spark,
        """MERGE INTO t USING s ON t.id = s.id
           WHEN MATCHED AND t.v < 25 THEN UPDATE SET v = 0
           WHEN MATCHED THEN DELETE""",
        {"t": root, "s": src},
    )
    assert rep["rows_updated"] == 2 and rep["rows_deleted"] == 1
    assert _rows(read_table(spark, root)) == [(1, 0.0), (2, 0.0)]
    # same rule for the by-source clauses
    run_sql(
        spark,
        """MERGE INTO t USING e ON t.id = e.id
           WHEN NOT MATCHED BY SOURCE AND t.id = 1 THEN UPDATE SET v = 7
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        {"t": root, "e": spark.createDataFrame([(99,)], "id long")},
    )
    assert _rows(read_table(spark, root)) == [(1, 7.0)]


def test_sql_create_if_not_exists_noops(spark, tmp_path):
    root = str(tmp_path / "t")
    rep = run_sql(
        spark, "CREATE TABLE t AS SELECT 1 AS a", {"t": root}
    )
    assert rep["version"] == 1
    rep = run_sql(
        spark, "CREATE TABLE IF NOT EXISTS t AS SELECT 2 AS a", {"t": root}
    )
    assert rep == {"op": "create_table", "version": 1, "skipped": True}
    assert _rows(read_table(spark, root)) == [(1,)]


def test_sql_merge_conditional_insert(spark, tmp_path):
    """VERDICT r8 gap #3: ``WHEN NOT MATCHED AND <cond> THEN INSERT``
    (both the column-list and ``INSERT *`` forms) gates inserts on a
    source-side condition — 3VL, only TRUE inserts."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10.0)], "id long, v double"), root
    )
    src = spark.createDataFrame(
        [(2, 5.0), (3, -1.0), (4, None)], "id long, v double"
    )
    rep = run_sql(
        spark,
        """MERGE INTO t USING s ON t.id = s.id
           WHEN NOT MATCHED AND s.v > 0 THEN INSERT (id, v)
           VALUES (s.id, s.v)""",
        {"t": root, "s": src},
    )
    assert rep["rows_inserted"] == 1  # NULL and negative both no-fire
    assert _rows(read_table(spark, root)) == [(1, 10.0), (2, 5.0)]
    rep = run_sql(
        spark,
        """MERGE INTO t USING s ON t.id = s.id
           WHEN NOT MATCHED AND s.v IS NULL THEN INSERT *""",
        {"t": root, "s": src},
    )
    assert rep["rows_inserted"] == 1
    assert _rows(read_table(spark, root)) == [
        (1, 10.0), (2, 5.0), (4, None),
    ]


def test_sql_merge_subquery_source(spark, tmp_path):
    """VERDICT r8 gap #3: ``MERGE ... USING (SELECT ...) AS s`` —
    the subquery is analyzed through the same Dataset.ofRows path as
    INSERT (registered tables become temp views), then merged like any
    DataFrame source. Also covers a subquery over the TARGET table
    itself (self-merge shape, reads the pre-statement snapshot)."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ),
        root,
    )
    extra = spark.createDataFrame(
        [(2, 200.0), (9, 900.0), (10, -1.0)], "id long, nv double"
    )
    rep = run_sql(
        spark,
        """MERGE INTO t USING (
               SELECT id, nv FROM extra WHERE nv > 0
           ) AS s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.nv
           WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""",
        {"t": root, "extra": extra},
    )
    assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
    assert _rows(read_table(spark, root)) == [
        (1, 10.0), (2, 200.0), (3, 30.0), (9, 900.0),
    ]
    # subquery reading the target snapshot itself (pre-statement state)
    run_sql(
        spark,
        """MERGE INTO t USING (
               SELECT id + 100 AS sid, v FROM t WHERE id <= 2
           ) AS s ON t.id = s.sid
           WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.sid, s.v)""",
        {"t": root},
    )
    assert _rows(read_table(spark, root)) == [
        (1, 10.0), (2, 200.0), (3, 30.0), (9, 900.0),
        (101, 10.0), (102, 200.0),
    ]
    # an UNALIASED subquery has no name to scope clauses by: loud error
    with pytest.raises(ValueError, match="aliased subquery|USING"):
        run_sql(
            spark,
            """MERGE INTO t USING (SELECT 1 AS id) ON t.id = id
               WHEN MATCHED THEN DELETE""",
            {"t": root},
        )


def test_sql_delete_without_where_empties_table(spark, tmp_path):
    """VERDICT r8 'what's wrong': unconditioned ``DELETE FROM t`` was
    the one statement form without a test. Spark's parser supplies a
    TRUE literal; with the r9 matched-density cap it routes CoW (no
    table-sized tombstone spray) and empties the table."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
    )
    rep = run_sql(spark, "DELETE FROM t", {"t": root})
    assert rep["rows_matched"] == 2 and rep["tier"] == "cow"
    got = read_table(spark, root)
    assert got.count() == 0
    assert not load_manifest(root, latest_version(root)).get("deletes")


def test_sql_insert_rejects_duplicate_query_output_names(spark, tmp_path):
    """VERDICT r8 'what's wrong': _run_insert maps positionally via
    column NAMES, so a query yielding duplicate output names failed
    analysis with an opaque ambiguity error — now a clear guard."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 1.0)], "a long, b double"), root
    )
    with pytest.raises(ValueError, match="duplicate output column names"):
        run_sql(
            spark,
            "INSERT INTO t SELECT id, id FROM src",
            {
                "t": root,
                "src": spark.createDataFrame([(5,)], "id long"),
            },
        )


# --- query_sql: the textual READ face with time travel -------------------


def _three_versions(spark, root):
    """v1 = {1,2}, v2 adds 3, v3 updates v of id=1. Returns the commit
    instants (epoch seconds) of each version."""
    import time

    from implementing_scds_in_hive_spark.operators.dml import update_where

    write_snapshot(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        root,
    )
    t1 = time.time()
    time.sleep(0.05)
    run_sql(
        spark,
        "INSERT INTO t VALUES (3, 30.0)",
        {"t": root},
    )
    t2 = time.time()
    time.sleep(0.05)
    update_where(spark, root, {"v": "777.0"}, "id = 1")
    return t1, t2, time.time()


def test_query_sql_version_as_of(spark, tmp_path):
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    _three_versions(spark, root)
    got = query_sql(
        spark, "SELECT id, v FROM t VERSION AS OF 1 ORDER BY id",
        {"t": root},
    )
    assert _rows(got) == [(1, 10.0), (2, 20.0)]
    # FOR-prefixed form, pinned mid-history
    got2 = query_sql(
        spark, "SELECT id, v FROM t FOR VERSION AS OF 2", {"t": root}
    )
    assert _rows(got2) == [(1, 10.0), (2, 20.0), (3, 30.0)]
    # unpinned = latest (divergence from the pin proves the pin is real)
    got3 = query_sql(spark, "SELECT id, v FROM t", {"t": root})
    assert _rows(got3) == [(1, 777.0), (2, 20.0), (3, 30.0)]


def test_query_sql_timestamp_as_of_and_mixed_pins(spark, tmp_path):
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    t1, t2, t3 = _three_versions(spark, root)

    def iso(ts):
        import datetime as dt

        return (
            dt.datetime.fromtimestamp(ts, dt.timezone.utc)
            .replace(tzinfo=None)
            .isoformat(sep=" ")
        )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = query_sql(
            spark,
            f"SELECT id, v FROM t TIMESTAMP AS OF '{iso(t1)}'",
            {"t": root},
        )
        assert _rows(got) == [(1, 10.0), (2, 20.0)]
        # the timestamp is an EXPRESSION, evaluated by Catalyst
        got2 = query_sql(
            spark,
            f"SELECT id, v FROM t TIMESTAMP AS OF "
            f"(TIMESTAMP '{iso(t2)}' + INTERVAL 0 SECOND)",
            {"t": root},
        )
        assert _rows(got2) == [(1, 10.0), (2, 20.0), (3, 30.0)]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    # two pins of the SAME table joined against its latest state: the
    # rows whose v changed between v1 and latest
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    got3 = query_sql(
        spark,
        """SELECT cur.id, old.v AS v_old, cur.v AS v_new
           FROM t cur JOIN t VERSION AS OF 1 old ON cur.id = old.id
           WHERE cur.v <> old.v""",
        {"t": root},
    )
    assert _rows(got3) == [(1, 10.0, 777.0)]


def test_query_sql_rejects_writes_and_bad_pins(spark, tmp_path):
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), root
    )
    with pytest.raises(ValueError, match="run_sql"):
        query_sql(spark, "DELETE FROM t WHERE id = 1", {"t": root})
    with pytest.raises(FileNotFoundError):
        query_sql(spark, "SELECT * FROM t VERSION AS OF 99", {"t": root})
    with pytest.raises(KeyError, match="register"):
        query_sql(spark, "SELECT * FROM nope VERSION AS OF 1", {"t": root})
    # a pinned read must not clobber the user's own temp view named t
    spark.range(5).createOrReplaceTempView("t")
    got = query_sql(spark, "SELECT id, v FROM t VERSION AS OF 1", {"t": root})
    assert _rows(got) == [(1, 1.0)]
    assert spark.table("t").count() == 5
    spark.catalog.dropTempView("t")


def test_query_sql_rejects_every_command_kind(spark, tmp_path):
    """r9 self-review: the write guard was a blacklist of run_sql's six
    verbs, but Dataset.ofRows EXECUTES Catalyst commands eagerly — an
    unlisted command (CREATE OR REPLACE TABLE, DROP TABLE, SET, CACHE)
    would write real catalog/config state from the documented read-only
    face. Now any Command plan is refused."""
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), root
    )
    for stmt in [
        "CREATE OR REPLACE TABLE junk AS SELECT 1 AS a",
        "DROP TABLE t",
        "TRUNCATE TABLE t",
        "CREATE VIEW vx AS SELECT 1 AS a",
        "SET spark.sql.shuffle.partitions=1",
        "CACHE TABLE t",
        "ALTER TABLE t DROP COLUMN v",
        "INSERT INTO t VALUES (2, 2.0)",
    ]:
        with pytest.raises(ValueError, match="read statements"):
            query_sql(spark, stmt, {"t": root})
    # no side effects leaked
    assert not any(
        tb.name in ("junk", "vx") for tb in spark.catalog.listTables()
    )
    assert _rows(read_table(spark, root)) == [(1, 1.0)]


def test_query_sql_time_travel_inside_cte(spark, tmp_path):
    """r9 self-review: CTE bodies live in cteRelations (innerChildren),
    not children() — a pin inside a WITH definition was never rewritten
    and failed analysis. The walk now rebuilds UnresolvedWith."""
    from implementing_scds_in_hive_spark.operators.dml import update_where
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id long, v double"
        ),
        root,
    )
    update_where(spark, root, {"v": "v * 10"}, "id = 1")
    got = query_sql(
        spark,
        """WITH old AS (SELECT id, v FROM t VERSION AS OF 1),
                diffs AS (
                    SELECT cur.id, cur.v - old.v AS dv
                    FROM t cur JOIN old ON cur.id = old.id)
           SELECT id, dv FROM diffs WHERE dv <> 0""",
        {"t": root},
    )
    assert _rows(got) == [(1, 90.0)]


def test_time_travel_in_write_statement_sources(spark, tmp_path):
    """Pins rewrite inside EVERY query path that funnels through
    _materialize_query: CTAS from a pinned version (the table-clone
    verb), INSERT from history, and a pinned MERGE subquery source."""
    from implementing_scds_in_hive_spark.operators.dml import update_where

    root = str(tmp_path / "t")
    clone = str(tmp_path / "clone")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id long, v double"
        ),
        root,
    )
    update_where(spark, root, {"v": "999.0"}, "id = 1")  # v2
    # CTAS from the pinned v1: a physical table clone of history
    rep = run_sql(
        spark,
        "CREATE TABLE clone AS SELECT id, v FROM t VERSION AS OF 1",
        {"t": root, "clone": clone},
    )
    assert rep["op"] == "create_table"
    assert _rows(read_table(spark, clone)) == [(1, 10.0), (2, 20.0)]
    # INSERT from history: re-append v1's row for id=1
    run_sql(
        spark,
        "INSERT INTO clone SELECT id + 100, v FROM t VERSION AS OF 1 "
        "WHERE id = 1",
        {"t": root, "clone": clone},
    )
    assert _rows(read_table(spark, clone)) == [
        (1, 10.0), (2, 20.0), (101, 10.0),
    ]
    # MERGE with a pinned subquery source: roll id=1 back to its v1
    # value through the merge verb
    rep = run_sql(
        spark,
        """MERGE INTO t USING (
               SELECT id, v AS old_v FROM t VERSION AS OF 1
           ) AS s ON t.id = s.id
           WHEN MATCHED AND t.v <> s.old_v THEN UPDATE SET v = s.old_v""",
        {"t": root},
    )
    assert rep["rows_updated"] == 1
    assert _rows(read_table(spark, root)) == [(1, 10.0), (2, 20.0)]


def test_query_sql_table_changes_tvf(spark, tmp_path):
    """Delta-parity change-feed TVF in the read face:
    ``table_changes(table, v_from, v_to, 'keys')`` resolves through
    snapshot_changes (key-join diff), composable with filters, joins
    and pins in the same statement."""
    from implementing_scds_in_hive_spark.operators.dml import (
        delete_where,
        update_where,
    )
    from implementing_scds_in_hive_spark.operators.sql_dml import query_sql

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ),
        root,
    )
    update_where(spark, root, {"v": "111.0"}, "id = 1")  # v2: U
    delete_where(spark, root, "id = 3")  # v3: D
    run_sql(spark, "INSERT INTO t VALUES (9, 90.0)", {"t": root})  # v4: I
    got = query_sql(
        spark,
        "SELECT op, id, v FROM table_changes('t', 1, 4, 'id') ORDER BY id",
        {"t": root},
    )
    # the feed carries the NEW-side payload (NULL for a delete)
    assert _rows(got) == [
        ("D", 3, None),
        ("I", 9, 90.0),
        ("U", 1, 111.0),
    ]
    # composes with a pin of the same table in one statement
    got2 = query_sql(
        spark,
        """SELECT c.op, c.id, old.v AS v_before
           FROM table_changes('t', 1, 4, 'id') c
           JOIN t VERSION AS OF 1 old ON c.id = old.id
           WHERE c.op = 'U'""",
        {"t": root},
    )
    assert _rows(got2) == [("U", 1, 10.0)]
    with pytest.raises(ValueError, match="table_changes takes"):
        query_sql(spark, "SELECT * FROM table_changes('t', 1, 4)", {"t": root})
    with pytest.raises(ValueError, match="integer version"):
        query_sql(
            spark,
            "SELECT * FROM table_changes('t', NULL, 4, 'id')",
            {"t": root},
        )
    # Spark's own TVFs stay Spark's to resolve — in the read face AND
    # in write-statement sources (r9 review: intercepting every TVF
    # broke range() in INSERT sources)
    assert query_sql(spark, "SELECT id FROM range(3)", {"t": root}).count() == 3
    run_sql(
        spark,
        "INSERT INTO t SELECT id + 1000, CAST(id AS DOUBLE) FROM range(2)",
        {"t": root},
    )
    assert read_table(spark, root).where("id >= 1000").count() == 2


def test_split_sql_statements_quote_and_comment_aware():
    """Pure splitter: ';' inside string literals, backticks, line and
    block comments must not split; comment-only fragments drop."""
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        split_sql_statements,
    )

    script = """
    -- leading comment; with a semicolon
    INSERT INTO t VALUES (1, 'a;b');
    /* block; comment */ UPDATE t SET v = 'x;y' -- trail; note
    WHERE id = 1;
    SELECT `weird;name`, "d;q" FROM t;
    DELETE FROM t WHERE v = 'it''s;fine\\'; still same';
    ;  ; -- only comments and empties between these
    SELECT 1
    """
    got = split_sql_statements(script)
    assert len(got) == 5, got
    assert got[0].endswith("VALUES (1, 'a;b')")
    assert "WHERE id = 1" in got[1] and "block; comment" in got[1]
    assert got[2].startswith("SELECT `weird;name`")
    assert "still same'" in got[3]
    # a comment between statements attaches to the NEXT statement
    # (harmless: Spark's parser handles leading comments)
    assert got[4].endswith("SELECT 1")
    assert split_sql_statements(" -- nothing\n ; /* x */ ;") == []


def test_run_sql_script_routes_writes_and_reads(spark, tmp_path):
    """The script runner executes statements in order, returning report
    dicts for writes/maintenance and DataFrames for reads — the
    reference's script modality over the full engine surface."""
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        run_sql_script,
    )

    root = str(tmp_path / "t")
    clone = str(tmp_path / "clone")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ),
        root,
    )
    results = run_sql_script(
        spark,
        """
        -- a realistic mixed script
        INSERT INTO t VALUES (4, 40.0);
        UPDATE t SET v = v * 2 WHERE id <= 2;
        DELETE FROM t WHERE id = 3;
        DESCRIBE HISTORY t;
        CREATE TABLE c AS SELECT * FROM t VERSION AS OF 1;
        SELECT id, v FROM t ORDER BY id
        """,
        {"t": root, "c": clone},
    )
    assert [r["op"] for r in results[:3]] == ["insert", "update", "delete"]
    assert results[3]["op"] == "describe_history"
    assert results[4]["op"] == "create_table"
    assert _rows(results[5]) == [(1, 20.0), (2, 40.0), (4, 40.0)]
    assert _rows(read_table(spark, clone)) == [
        (1, 10.0), (2, 20.0), (3, 30.0),
    ]
    # a non-read command still refuses loudly mid-script, after the
    # prior statements committed
    with pytest.raises(ValueError, match="read statements"):
        run_sql_script(
            spark,
            "INSERT INTO t VALUES (9, 90.0); DROP TABLE t",
            {"t": root},
        )
    assert (9, 90.0) in _rows(read_table(spark, root))


def test_split_sql_statements_nested_block_comments():
    """ADVICE r9: Spark supports NESTED bracketed comments
    (SPARK-28880) — ``/* a /* b */ ; c */`` is one comment, so the
    scanner must track depth; a flat scanner leaves comment state at
    the first ``*/`` and splits on the ';' in the outer tail, handing
    run_sql_script an unparseable fragment."""
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        split_sql_statements,
    )

    got = split_sql_statements(
        "SELECT 1 /* a /* b */ ; c */ ; SELECT 2; /* x /* y; */ z */ "
        "SELECT 3;"
    )
    assert got == [
        "SELECT 1 /* a /* b */ ; c */",
        "SELECT 2",
        "/* x /* y; */ z */ SELECT 3",
    ]
    # two levels deep, and a '/*' opener inside a line comment or
    # string must NOT increment depth
    assert split_sql_statements(
        "SELECT '/*' /* l1 /* l2 /* l3; */ */ ; */; SELECT 2;"
    ) == ["SELECT '/*' /* l1 /* l2 /* l3; */ */ ; */", "SELECT 2"]
    # comment-only fragments still drop
    assert split_sql_statements("/* a /* b */ c */ ;") == []


def test_describe_detail_and_timestamp_table_changes(spark, tmp_path):
    """r10 late parity verbs: DESCRIBE DETAIL (one manifest read +
    driver-side size walk — shape, layout, mapping and MoR debt in one
    dict) and timestamp bounds for the table_changes TVF (resolved
    through the commit log like TIMESTAMP AS OF; integers and
    timestamps mix freely; malformed strings fail with the TVF's own
    error, not a raw cast traceback)."""
    import datetime
    import time

    from implementing_scds_in_hive_spark.operators.dml import update_where
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        query_sql,
        run_sql,
        run_sql_script,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        load_manifest,
        rename_column_commit,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        root,
        app_meta={"watermark": 3},
    )
    t1 = datetime.datetime.utcfromtimestamp(
        load_manifest(root, 1)["committed_at"] + 0.01
    ).isoformat(sep=" ")
    time.sleep(0.05)
    update_where(spark, root, {"v": "111.0"}, "id = 1")
    t2 = datetime.datetime.utcfromtimestamp(
        load_manifest(root, 2)["committed_at"] + 0.01
    ).isoformat(sep=" ")

    got = query_sql(
        spark,
        f"SELECT op, id, v FROM table_changes('t', '{t1}', '{t2}', 'id')",
        {"t": root},
    )
    assert _rows(got) == [("U", 1, 111.0)]
    # integer + timestamp bounds mix
    got2 = query_sql(
        spark,
        f"SELECT op, id FROM table_changes('t', 1, '{t2}', 'id')",
        {"t": root},
    )
    assert _rows(got2) == [("U", 1)]
    with pytest.raises(ValueError, match="integer version"):
        query_sql(
            spark,
            "SELECT * FROM table_changes('t', 'nope', 2, 'id')",
            {"t": root},
        )
    # DESCRIBE DETAIL after a rename surfaces the mapping too
    rename_column_commit(root, "v", "val")
    det = run_sql(spark, "DESCRIBE DETAIL t", {"t": root})
    assert det["op"] == "describe_detail" and det["version"] == 3
    assert det["columns"] == ["id", "val"]
    assert det["column_mapping"] == {"val": "v"}
    assert det["app_meta"]["watermark"] == 3
    assert det["num_files"] >= 1 and det["size_bytes"] > 0
    # the script runner routes DESCRIBE DETAIL as maintenance
    res = run_sql_script(
        spark, "DESCRIBE DETAIL t; SELECT count(*) AS n FROM t;",
        {"t": root},
    )
    assert res[0]["op"] == "describe_detail"
    assert res[1].first()["n"] == 2


def test_maintenance_verbs_tolerate_leading_comments(spark, tmp_path):
    """r11: the ^-anchored maintenance-verb regexes must see through
    leading -- and /* */ comments (a commented SHALLOW CLONE inside a
    script fell through to Spark's parser and died on
    PARSE_SYNTAX_ERROR; Spark itself tolerates the comment, so the
    regex face must too)."""
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        run_sql,
        run_sql_script,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        write_snapshot,
    )

    root = str(tmp_path / "t")
    dst = str(tmp_path / "c")
    write_snapshot(spark.range(5).selectExpr("id", "id * 2 AS v"), root)
    t = {"t": root, "c": dst}
    out = run_sql(
        spark,
        "-- take a zero-copy backup\n"
        "/* block comment too */\n"
        "CREATE TABLE c SHALLOW CLONE t VERSION AS OF 1",
        t,
    )
    assert out["op"] == "shallow_clone"
    res = run_sql_script(
        spark,
        """
        -- observability verb behind a comment
        DESCRIBE DETAIL c;
        SELECT COUNT(*) AS n FROM c;
        """,
        t,
    )
    assert res[0]["op"] == "describe_detail"
    assert res[-1].collect()[0]["n"] == 5


def test_nested_block_comment_before_maintenance_verb(spark, tmp_path):
    """r11 review pass #1: block comments NEST in Spark's grammar
    (SPARK-28880) — the leading-comment stripper must track depth or a
    nested comment before VACUUM still falls through to the parser."""
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        _strip_leading_comments,
        run_sql,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        write_snapshot,
    )

    assert (
        _strip_leading_comments("/* note /* nested */ tail */ VACUUM t")
        == "VACUUM t"
    )
    root = str(tmp_path / "t")
    write_snapshot(spark.range(5).selectExpr("id"), root)
    out = run_sql(
        spark, "/* a /* b */ c */ DESCRIBE DETAIL t", {"t": root}
    )
    assert out["op"] == "describe_detail"
    assert out["external_files"] == 0 and out["external_fraction"] == 0.0


def test_restore_timestamp_vacuum_dry_run_and_create_like(
    spark, tmp_path
):
    """r11 verbs: RESTORE ... TIMESTAMP AS OF resolves through the
    commit log like time travel; VACUUM ... DRY RUN is a strictly
    read-only preview (no deletes, and no grace tombstones started);
    CREATE TABLE d LIKE s commits an EMPTY table with the source's
    logical schema — the reference's literal step 1
    (SCD_script.txt:4)."""
    import os
    import time

    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_snapshot,
        rename_column_commit,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(spark.range(10).selectExpr("id", "id * 2 AS v"), root)
    v1_rows = sorted(map(tuple, read_snapshot(spark, root).collect()))
    ts_after_v1 = load_manifest(root, 1)["committed_at"] + 0.001
    time.sleep(0.01)
    run_sql(spark, "UPDATE t SET v = v + 1 WHERE id < 5", {"t": root})
    assert sorted(
        map(tuple, read_snapshot(spark, root).collect())
    ) != v1_rows

    import datetime

    iso = datetime.datetime.fromtimestamp(
        ts_after_v1, datetime.timezone.utc
    ).replace(tzinfo=None).isoformat(sep=" ")
    out = run_sql(
        spark,
        f"RESTORE TABLE t TO TIMESTAMP AS OF '{iso}'",
        {"t": root},
    )
    assert out["op"] == "restore"
    assert sorted(
        map(tuple, read_snapshot(spark, root).collect())
    ) == v1_rows

    # DRY RUN: three versions exist; a real vacuum at grace 0 would
    # drop v1 and reclaim its superseded dir — the preview must report
    # the same set while deleting nothing and starting no grace clocks
    def _listing(p):
        return sorted(
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(p)
            for f in fs
        )

    before_fs = _listing(root)
    rep = run_sql(
        spark, "VACUUM t RETAIN 0 HOURS DRY RUN", {"t": root},
        keep_last=1,
    )
    assert rep["dry_run"] is True
    assert rep["dropped_versions"], "preview must name droppable versions"
    # at grace 0 a real pass deletes un-tombstoned dirs in the SAME
    # pass, so the preview must classify them as removed, not pending
    # (r11 review pass #2)
    would = set(rep["removed_dirs"])
    assert would and not rep["pending_dirs"]
    assert _listing(root) == before_fs, "DRY RUN must not touch disk"
    # a real pass deletes exactly what the preview named
    rep2 = run_sql(
        spark, "VACUUM t RETAIN 0 HOURS", {"t": root}, keep_last=1
    )
    assert would <= set(rep2["removed_dirs"])
    assert _listing(root) != before_fs

    # CREATE TABLE LIKE: copy the schema of a RENAMED source — the new
    # table gets the LOGICAL schema, no column mapping, zero rows
    src = str(tmp_path / "src")
    write_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS price"),
        src,
        partition_by=None,
    )
    rename_column_commit(src, "price", "amount")
    dst = str(tmp_path / "like")
    out = run_sql(
        spark, "CREATE TABLE d LIKE s", {"s": src, "d": dst}
    )
    assert out["op"] == "create_table_like" and out["version"] == 1
    got = read_snapshot(spark, dst)
    assert got.columns == ["id", "amount"] and got.count() == 0
    m = load_manifest(dst, 1)
    assert "column_mapping" not in m and m["files"] == []
    # the empty table accepts writes like any table
    write_snapshot(
        spark.range(3).selectExpr("id", "id * 3 AS amount"),
        dst,
        mode="append",
    )
    assert read_snapshot(spark, dst).count() == 3
    # pinned LIKE copies the HISTORICAL schema (pre-rename)
    dst2 = str(tmp_path / "like2")
    run_sql(
        spark,
        "CREATE TABLE d LIKE s VERSION AS OF 1",
        {"s": src, "d": dst2},
    )
    assert read_snapshot(spark, dst2).columns == ["id", "price"]
