"""Column mapping — ALTER TABLE RENAME/DROP COLUMN as pure metadata
commits (VERDICT r9 next-round #2, the Delta/Iceberg name-mode column
mapping).

Protocol: files and deletion vectors always store PHYSICAL names; the
manifest schema, partition_by and stats keys are LOGICAL; the
manifest's ``column_mapping`` translates. RENAME changes only the
logical name (carried files keep serving the old physical name); DROP
removes the field and RETIRES its physical name so a later ADD of the
same logical name reads as NULL from old files — never the dropped
bytes. Reference anchor: the reference's hand-kept fixed DDL column
order (/root/reference/README.md:38-52) is exactly the fragility
mapping removes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dml import (
    delete_where,
    merge_into,
    update_where,
)
from implementing_scds_in_hive_spark.sources.snapshot import (
    drop_column_commit,
    evolve_schema_commit,
    latest_version,
    load_manifest,
    read_snapshot,
    rename_column_commit,
    restore_commit,
    write_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _base(spark, root, n=100, files=4):
    return write_snapshot(
        spark.range(n)
        .selectExpr("id", "id * 2 AS price", "CAST(id % 5 AS STRING) AS seg")
        .repartitionByRange(files, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )


def test_rename_is_metadata_only_and_time_travel_sees_old_name(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    v1 = _base(spark, root)
    m1 = load_manifest(root, v1)
    v2 = rename_column_commit(root, "price", "amount")
    m2 = load_manifest(root, v2)
    # pure metadata: identical file list, mapping serves the old bytes
    assert m2["files"] == m1["files"]
    assert m2["column_mapping"] == {"amount": "price"}
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "amount", "seg"]
    assert cur.where("amount = 20").count() == 1
    # pinned read BEFORE the rename sees the OLD name and values
    old = read_snapshot(spark, root, version=v1)
    assert old.columns == ["id", "price", "seg"]
    assert _rows(old.select("id", "price")) == _rows(
        cur.select("id", "amount")
    )
    # stats prune still bites (keys stayed logical)
    assert read_snapshot(spark, root, prune={"id": (0, 0)}).count() < 100
    # case-insensitive resolution like the analyzer; collision refused
    with pytest.raises(ValueError, match="already exists"):
        rename_column_commit(root, "AMOUNT", "seg")
    with pytest.raises(ValueError, match="no such column"):
        rename_column_commit(root, "price", "x")


def test_writes_and_dml_speak_logical_names_after_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    rename_column_commit(root, "price", "amount")
    # append with the NEW logical name; old and new files both serve it
    write_snapshot(
        spark.range(100, 110).selectExpr(
            "id", "id * 2 AS amount", "CAST(id % 5 AS STRING) AS seg"
        ),
        root,
        mode="append",
    )
    cur = read_snapshot(spark, root)
    assert cur.count() == 110
    assert cur.where("amount = 218").count() == 1  # post-rename file
    assert cur.where("amount = 20").count() == 1  # pre-rename file
    # CoW update on the renamed column
    update_where(spark, root, {"amount": "amount + 1"}, "id = 3")
    assert read_snapshot(spark, root).where("id = 3").first()["amount"] == 7
    # MoR row-format vectors twice on one file: the second delete folds
    # the first's PHYSICAL-named vectors through the mapping
    delete_where(spark, root, "id = 7", tier="mor", vector_format="row")
    delete_where(spark, root, "id = 8", tier="mor", vector_format="row")
    assert read_snapshot(spark, root).where("id IN (7, 8)").count() == 0
    # merge: clauses reference the logical name
    src = spark.createDataFrame([(3, 999), (200, 1)], "id long, amount long")
    merge_into(
        spark, root, src, ["id"],
        when_matched_update={"amount": "s.amount"},
        when_not_matched_insert={"id": "s.id", "amount": "s.amount"},
    )
    cur = read_snapshot(spark, root)
    assert cur.where("id = 3").first()["amount"] == 999
    assert cur.where("id = 200").count() == 1


def test_drop_retires_physical_name_no_resurrection(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    v = drop_column_commit(root, "seg")
    m = load_manifest(root, v)
    assert m["retired_physical"] == ["seg"]
    assert read_snapshot(spark, root).columns == ["id", "price"]
    # re-ADD the same logical name: fresh physical, all NULL — the
    # dropped bytes in the carried files must NOT resurrect
    evolve_schema_commit(root, [("seg", "string")])
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "price", "seg"]
    assert cur.where("seg IS NOT NULL").count() == 0
    m2 = load_manifest(root, latest_version(root))
    assert m2["column_mapping"]["seg"] != "seg"
    # writable under the fresh physical name
    update_where(spark, root, {"seg": "'new'"}, "id = 1")
    got = read_snapshot(spark, root).where("seg IS NOT NULL")
    assert _rows(got.select("id", "seg")) == [(1, "new")]


def test_rename_then_add_old_name_reads_null(spark, tmp_path):
    """After RENAME a->b, the physical name 'a' still exists inside
    every carried file (serving b); ADD COLUMN a must therefore map to
    a fresh physical name and read NULL, not b's bytes."""
    root = str(tmp_path / "t")
    _base(spark, root)
    rename_column_commit(root, "price", "amount")
    evolve_schema_commit(root, [("price", "double")])
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "amount", "seg", "price"]
    assert cur.where("price IS NOT NULL").count() == 0
    assert cur.where("amount IS NULL").count() == 0


def test_rename_chain_and_swap(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    rename_column_commit(root, "price", "tmp_x")
    rename_column_commit(root, "tmp_x", "cost")
    m = load_manifest(root, latest_version(root))
    assert m["column_mapping"] == {"cost": "price"}
    # full SWAP of two columns' names
    rename_column_commit(root, "cost", "hold")
    rename_column_commit(root, "seg", "cost")
    rename_column_commit(root, "hold", "seg")
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "seg", "cost"]
    # 'seg' now serves the ORIGINAL price values, 'cost' the labels
    assert cur.where("id = 10").first()["seg"] == 20
    assert cur.where("id = 10").first()["cost"] == "0"


def test_drop_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(40).selectExpr(
            "id", "id * 2 AS v", "CAST(id % 2 AS STRING) AS p"
        ),
        root,
        partition_by=["p"],
        stats_cols=["id"],
    )
    with pytest.raises(ValueError, match="partition column"):
        drop_column_commit(root, "p")
    # row-format vectors embed key VALUES per column: drop refused
    delete_where(spark, root, "id = 3", tier="mor", vector_format="row")
    with pytest.raises(ValueError, match="compact_deletes"):
        drop_column_commit(root, "v")
    # positional vectors carry no column names: drop allowed
    from implementing_scds_in_hive_spark.sources.sinks import (
        compact_deletes,
    )

    compact_deletes(spark, root)
    delete_where(spark, root, "id = 5", tier="mor", vector_format="pos")
    v = drop_column_commit(root, "v")
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "p"]
    assert cur.where("id IN (3, 5)").count() == 0
    with pytest.raises(ValueError, match="partition column"):
        drop_column_commit(root, "p")
    assert latest_version(root) == v


def test_drop_every_column_and_multi_drop_atomicity(spark, tmp_path):
    """The 'drop everything' refusal, and (r10 self-review) the ATOMIC
    multi-column drop: a list with one refused name must commit
    NOTHING — a per-column loop would leave the table half-altered."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS a", "id * 3 AS b"),
        root,
    )
    with pytest.raises(ValueError, match="every column"):
        drop_column_commit(root, ["id", "a", "b"])
    with pytest.raises(ValueError, match="no such column"):
        drop_column_commit(root, ["a", "nope"])
    with pytest.raises(ValueError, match="duplicate column"):
        drop_column_commit(root, ["a", "A"])
    # nothing committed by the refused statements
    assert latest_version(root) == 1
    assert read_snapshot(spark, root).columns == ["id", "a", "b"]
    # a valid multi-drop lands as ONE commit
    v = drop_column_commit(root, ["a", "b"])
    assert v == 2
    assert read_snapshot(spark, root).columns == ["id"]
    # SQL face: one refused name aborts the whole statement atomically
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql

    root2 = str(tmp_path / "t2")
    write_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS a", "id * 3 AS b"),
        root2,
    )
    with pytest.raises(ValueError, match="no such column"):
        run_sql(spark, "ALTER TABLE t DROP COLUMNS (a, nope)", {"t": root2})
    assert read_snapshot(spark, root2).columns == ["id", "a", "b"]
    assert latest_version(root2) == 1
    rep = run_sql(
        spark, "ALTER TABLE t DROP COLUMNS (a, b)", {"t": root2}
    )
    assert rep["dropped"] == ["a", "b"] and rep["version"] == 2
    assert read_snapshot(spark, root2).columns == ["id"]


def test_partition_column_rename(spark, tmp_path):
    """Partition dirs keep the PHYSICAL ``col=value`` layout; the
    logical rename re-labels partition_by and the read surface."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(40).selectExpr(
            "id", "id * 2 AS v", "CAST(id % 2 AS STRING) AS p"
        ),
        root,
        partition_by=["p"],
        stats_cols=["id"],
    )
    before = _rows(read_snapshot(spark, root))
    rename_column_commit(root, "p", "bucket")
    m = load_manifest(root, latest_version(root))
    assert m["partition_by"] == ["bucket"]
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "v", "bucket"]
    assert _rows(cur) == before
    assert cur.where("bucket = '1'").count() == 20
    # appends keep landing in the physical p=... layout
    write_snapshot(
        spark.range(40, 44).selectExpr(
            "id", "id * 2 AS v", "CAST(id % 2 AS STRING) AS bucket"
        ),
        root,
        mode="append",
        partition_by=["bucket"],
    )
    assert read_snapshot(spark, root).where("bucket = '0'").count() == 22
    # prune on the renamed partition column still skips files
    assert (
        read_snapshot(spark, root, prune={"bucket": ("1", "1")}).count()
        == 22
    )


def test_restore_and_history_across_rename_and_drop(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = _base(spark, root)
    rename_column_commit(root, "price", "amount")
    drop_column_commit(root, "seg")
    assert read_snapshot(spark, root).columns == ["id", "amount"]
    # restore adopts the restored version's names AND mapping
    restore_commit(root, v1)
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "price", "seg"]
    assert cur.count() == 100
    # and the post-restore table evolves cleanly again
    rename_column_commit(root, "seg", "label")
    assert read_snapshot(spark, root).columns == ["id", "price", "label"]


def test_stats_prune_follows_rename_of_stats_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=400, files=8)
    files_before = len(
        read_snapshot(spark, root, prune={"id": (0, 0)}).inputFiles()
    )
    rename_column_commit(root, "id", "key")
    pruned = read_snapshot(spark, root, prune={"key": (0, 0)})
    assert len(pruned.inputFiles()) == files_before
    assert pruned.where("key = 0").count() == 1
    # a CoW rewrite on the mapped table records stats under the
    # LOGICAL key and keeps pruning
    update_where(spark, root, {"price": "price + 1"}, "key = 0")
    pruned2 = read_snapshot(spark, root, prune={"key": (0, 0)})
    assert pruned2.where("key = 0").first()["price"] == 1
    m = load_manifest(root, latest_version(root))
    assert all(
        set(per) <= {"key"} for per in m.get("stats", {}).values()
    )


def test_sql_face_rename_drop_and_pinned_reads(spark, tmp_path):
    from implementing_scds_in_hive_spark.operators.sql_dml import (
        query_sql,
        run_sql,
        run_sql_script,
    )

    root = str(tmp_path / "t")
    v1 = write_snapshot(
        spark.range(10).selectExpr("id", "id * 2 AS price", "'x' AS note"),
        root,
    )
    T = {"t": root}
    rep = run_sql(spark, "ALTER TABLE t RENAME COLUMN price TO amount", T)
    assert rep["op"] == "rename_column" and rep["renamed"] == {
        "price": "amount"
    }
    got = query_sql(
        spark, "SELECT id, amount FROM t WHERE amount > 14 ORDER BY id", T
    )
    assert _rows(got) == [(8, 16), (9, 18)]
    # pinned SQL read ACROSS the rename sees the old name (time travel
    # resolves through the pinned manifest's own schema + mapping)
    old = query_sql(
        spark, f"SELECT id, price FROM t VERSION AS OF {v1} WHERE price = 4",
        T,
    )
    assert _rows(old) == [(2, 4)]
    rep2 = run_sql(spark, "ALTER TABLE t DROP COLUMN note", T)
    assert rep2["dropped"] == ["note"]
    assert query_sql(spark, "SELECT * FROM t", T).columns == ["id", "amount"]
    rep3 = run_sql(spark, "ALTER TABLE t DROP COLUMN IF EXISTS nope", T)
    assert rep3 == {
        "op": "drop_columns", "version": None, "dropped": [],
        "skipped": ["nope"],
    }
    with pytest.raises(ValueError, match="no such column"):
        run_sql(spark, "ALTER TABLE t DROP COLUMN nope", T)
    # nested fields refused loudly
    with pytest.raises(ValueError, match="top-level"):
        run_sql(spark, "ALTER TABLE t RENAME COLUMN a.b TO c", T)
    # the script runner routes the new verbs
    res = run_sql_script(
        spark,
        """
        ALTER TABLE t RENAME COLUMN amount TO total;
        UPDATE t SET total = total + 1 WHERE id = 0;
        SELECT id, total FROM t WHERE id <= 1 ORDER BY id;
        """,
        T,
    )
    assert _rows(res[-1]) == [(0, 1), (1, 2)]


def test_maintenance_on_mapped_table_preserves_mapping(spark, tmp_path):
    """compact/compact_deletes rewrite through write_snapshot, so the
    rewritten files adopt the mapping's PHYSICAL names and the mapping
    itself must survive the content-preserving commit."""
    from implementing_scds_in_hive_spark.sources.sinks import (
        compact_deletes,
    )

    root = str(tmp_path / "t")
    _base(spark, root)
    rename_column_commit(root, "price", "amount")
    delete_where(spark, root, "id IN (1, 51)", tier="mor")
    before = _rows(read_snapshot(spark, root))
    compact_deletes(spark, root)
    m = load_manifest(root, latest_version(root))
    assert m["column_mapping"] == {"amount": "price"}
    assert not m.get("deletes")
    assert _rows(read_snapshot(spark, root)) == before
    # the rewritten files physically carry 'price' (mapping-consistent)
    import pyarrow.parquet as pq
    import os

    names = set()
    for f in m["files"]:
        names |= set(pq.read_schema(os.path.join(root, f)).names)
    assert "price" in names and "amount" not in names


def test_protocol_model_with_column_mapping(spark, tmp_path):
    """Model-based check (VERDICT r9 next-round #2 'alongside the r9
    evolve transitions'): any chain of overwrite / append / positional
    MoR delete / carry-by-reference restore / evolve (optionally
    RE-ADDING a previously dropped name — the resurrection probe) /
    RENAME COLUMN / DROP COLUMN / fold / vacuum keeps read_table()
    equal to a trivial in-memory model (id multiset + ordered
    (name, kind) column list, kind 'v' = carries f'v{id}' values,
    'null' = evolved-in, always NULL), with time travel exact for
    every retained version INCLUDING its historical names."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from implementing_scds_in_hive_spark.operators.dml import (
        restore_version,
    )
    from implementing_scds_in_hive_spark.sources.sinks import (
        compact_deletes,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        list_versions,
        read_table,
        vacuum,
    )

    def _df(rows, cols):
        schema = "id long" + "".join(f", {n} string" for n, _k in cols)
        data = [
            (int(i),)
            + tuple(f"v{i}" if k == "v" else None for _n, k in cols)
            for i in rows
        ]
        return spark.createDataFrame(data, schema)

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
        st.tuples(st.just("pos_delete"), keys_strategy),
        st.tuples(st.just("restore"), st.integers(min_value=0, max_value=7)),
        st.tuples(st.just("evolve"), st.booleans()),
        st.tuples(st.just("rename"), st.integers(min_value=0, max_value=5)),
        st.tuples(st.just("drop"), st.integers(min_value=0, max_value=5)),
        st.tuples(st.just("fold"), st.none()),
        st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=3)),
    )
    counter = [0]

    @settings(
        max_examples=5, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture,
                               HealthCheck.too_slow],
    )
    @given(ops=st.lists(op_strategy, min_size=2, max_size=5))
    def run(ops):
        counter[0] += 1
        root = str(tmp_path / f"model_{counter[0]}")
        cols = [("v", "v")]
        write_snapshot(_df([0, 1, 2], cols).repartition(2), root)
        model = [0, 1, 2]
        n_new = [0]
        dropped: list[str] = []
        history = {latest_version(root): (sorted(model), tuple(cols))}
        for op, arg in ops:
            if op == "overwrite":
                write_snapshot(_df(arg, cols), root)
                model = list(arg)
            elif op == "append":
                write_snapshot(_df(arg, cols), root, mode="append")
                model = model + list(arg)
            elif op == "pos_delete":
                pred = "id IN (" + ",".join(map(str, arg)) + ")"
                delete_where(spark, root, pred, tier="mor")
                model = [x for x in model if x not in set(arg)]
            elif op == "restore":
                vs = list_versions(root)
                target = vs[arg % len(vs)]
                restore_version(spark, root, target)
                model = list(history[target][0])
                cols = list(history[target][1])
            elif op == "evolve":
                live = {n for n, _ in cols}
                reuse = [n for n in dropped if n not in live]
                if arg and reuse:
                    name = reuse[-1]  # resurrection probe
                else:
                    n_new[0] += 1
                    name = f"e{n_new[0]}"
                if name in live:
                    continue
                evolve_schema_commit(root, [(name, "string")])
                cols = cols + [(name, "null")]
            elif op == "rename":
                if not cols:
                    continue
                idx = arg % len(cols)
                n_new[0] += 1
                new = f"r{n_new[0]}"
                rename_column_commit(root, cols[idx][0], new)
                cols = [
                    (new, k) if i == idx else (n, k)
                    for i, (n, k) in enumerate(cols)
                ]
            elif op == "drop":
                if not cols:
                    continue
                idx = arg % len(cols)
                name = cols[idx][0]
                drop_column_commit(root, name)
                dropped.append(name)
                cols = [c for i, c in enumerate(cols) if i != idx]
            elif op == "fold":
                compact_deletes(spark, root)
            elif op == "vacuum":
                vacuum(root, keep_last=arg, grace_seconds=3600.0)
            history[latest_version(root)] = (sorted(model), tuple(cols))
            head = read_table(spark, root)
            assert head.columns == ["id", *[n for n, _ in cols]], (
                f"after {op}({arg}): schema {head.columns}"
            )
            got = sorted(
                (r["id"], *[r[n] for n, _ in cols]) for r in head.collect()
            )
            want = sorted(
                (i, *[f"v{i}" if k == "v" else None for _n, k in cols])
                for i in model
            )
            assert got == want, f"after {op}({arg}): {got} != {want}"
        for v in list_versions(root):
            if v in history:
                pin = read_snapshot(spark, root, version=v)
                ids, vcols = history[v]
                assert pin.columns == ["id", *[n for n, _ in vcols]], (
                    f"schema v{v}"
                )
                got = sorted(
                    (r["id"], *[r[n] for n, _ in vcols])
                    for r in pin.collect()
                )
                want = sorted(
                    (i, *[f"v{i}" if k == "v" else None for _n, k in vcols])
                    for i in ids
                )
                assert got == want, f"time travel v{v}"

    run()


def test_append_staged_before_concurrent_drop_aborts_loudly(
    spark, tmp_path
):
    """r10 self-review (the one CONFIRMED race): an append STAGED
    against the pre-drop parent carries the dropped column as an
    apparent evolution column whose identity physical name is now
    RETIRED — committing it would silently resurrect the dropped bytes
    from every carried file. The commit guard must abort loudly and
    abandon the stage instead."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
        commit,
        stage_files,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr(
            "id", "id * 2 AS price", "CAST(id AS STRING) AS seg"
        ),
        root,
    )
    staged = stage_files(
        spark.range(5, 8).selectExpr(
            "id", "id * 2 AS price", "CAST(id AS STRING) AS seg"
        ),
        root,
    )
    drop_column_commit(root, "seg")  # the concurrent writer wins
    with pytest.raises(CommitConflictError, match="re-stage"):
        commit(root, staged, mode="append")
    # nothing leaked: no version burned, no resurrection, stage gone
    assert latest_version(root) == 2
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "price"] and cur.count() == 5
    # the same race against a RENAME: the prefix check catches it
    write_snapshot(
        spark.range(3).selectExpr("id", "id * 2 AS v"), str(tmp_path / "u")
    )
    staged2 = stage_files(
        spark.range(3, 5).selectExpr("id", "id * 2 AS v"),
        str(tmp_path / "u"),
    )
    rename_column_commit(str(tmp_path / "u"), "v", "w")
    with pytest.raises(ValueError, match="prefix"):
        commit(str(tmp_path / "u"), staged2, mode="append")


def test_case_variant_readd_does_not_resurrect(spark, tmp_path):
    """r10 second review pass (CONFIRMED): parquet name resolution is
    case-insensitive like the analyzer, so after DROP COLUMN seg a
    re-ADD as 'Seg' must get a fresh physical name — an exact-case
    collision check would serve the dropped bytes under the case
    variant."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(10).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root,
    )
    drop_column_commit(root, "seg")
    evolve_schema_commit(root, [("Seg", "string")])
    cur = read_snapshot(spark, root)
    assert cur.where("Seg IS NOT NULL").count() == 0
    m = load_manifest(root, latest_version(root))
    assert m["column_mapping"]["Seg"].casefold() != "seg"
    # the same invariant through append-mode evolution
    root2 = str(tmp_path / "u")
    write_snapshot(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root2,
    )
    drop_column_commit(root2, "seg")
    write_snapshot(
        spark.range(5, 7).selectExpr(
            "id", "CAST(NULL AS STRING) AS SEG"
        ),
        root2,
        mode="append",
    )
    cur2 = read_snapshot(spark, root2)
    assert cur2.columns == ["id", "SEG"]
    assert cur2.where("SEG IS NOT NULL").count() == 0


def test_shape_restoring_drop_add_race_aborts(spark, tmp_path):
    """ADVICE r10 (medium): a concurrent DROP of the LAST column
    followed by an ADD of the same logical name restores the parent's
    schema SHAPE, so the appended-column guard alone sees nothing new —
    but the staged files hold the now-RETIRED physical name while the
    fresh parent maps the logical name to a new physical. Committing
    would silently read the appended rows' column as NULL (or, with a
    stale staged mapping, resurrect retired bytes). The prefix-physical
    check must abort loudly."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
        commit,
        evolve_schema_commit,
        stage_files,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root,
    )
    staged = stage_files(
        spark.range(5, 8).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root,
    )
    drop_column_commit(root, "seg")
    evolve_schema_commit(root, [("seg", "string")])  # shape restored
    m = load_manifest(root, latest_version(root))
    assert m["column_mapping"]["seg"].casefold() != "seg"
    with pytest.raises(CommitConflictError, match="re-stage"):
        commit(root, staged, mode="append")
    # no version burned, no resurrection, the re-added column is NULL
    assert latest_version(root) == 3
    cur = read_snapshot(spark, root)
    assert cur.count() == 5
    assert cur.where("seg IS NOT NULL").count() == 0


def test_commit_merges_staged_mapping_over_current_parent(
    spark, tmp_path
):
    """ADVICE r10 (medium, second half): commit must MERGE the staged
    column_mapping over the CURRENT parent's, never replace it — the
    staged dict was computed at stage time and contributes only the
    appended evolution columns; the parent's fresher prefix entries
    survive."""
    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root,
    )
    drop_column_commit(root, "seg")
    # re-ADD seg via an append (fresh physical) — parent mapping active
    write_snapshot(
        spark.range(5, 7).selectExpr("id", "CAST(NULL AS STRING) AS seg"),
        root,
        mode="append",
    )
    m = load_manifest(root, latest_version(root))
    seg_phys = m["column_mapping"]["seg"]
    assert seg_phys.casefold() != "seg"
    # now append ANOTHER new column: the staged mapping carries the
    # prefix entry for seg plus (if colliding) the new column; commit
    # must keep the parent's seg entry intact and add only new keys
    write_snapshot(
        spark.range(7, 9).selectExpr(
            "id",
            "CAST(NULL AS STRING) AS seg",
            "CAST(id AS DOUBLE) AS extra",
        ),
        root,
        mode="append",
    )
    m2 = load_manifest(root, latest_version(root))
    assert m2["column_mapping"]["seg"] == seg_phys
    cur = read_snapshot(spark, root)
    assert cur.columns == ["id", "seg", "extra"]
    assert cur.where("seg IS NOT NULL").count() == 0
    assert cur.where("extra IS NOT NULL").count() == 2


def test_change_feed_across_rename_and_reused_logical_name(
    spark, tmp_path
):
    """ADVICE r10 (medium): _diff_sides' wider-schema pinning must
    translate the column mapping. A plain RENAME across the window
    diffs cleanly (metadata-only commit -> empty feed), and a window
    straddling DROP + re-ADD of the same logical name must read the
    narrow side's borrowed column as NULL — never the dropped bytes
    out of carried files."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        evolve_schema_commit,
        snapshot_changes,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS price"), root
    )
    v2 = rename_column_commit(root, "price", "amount")
    # rename is metadata-only: the feed is EMPTY under the new names
    ch = snapshot_changes(spark, root, 1, v2, ["id"])
    assert ch.count() == 0
    assert "amount" in ch.columns and "price" not in ch.columns

    # window straddling DROP + re-ADD of the same logical name: the
    # narrow (post-drop) side borrows the wider schema's new column —
    # it must NULL-backfill, not resurrect the dropped amount bytes
    v3 = drop_column_commit(root, "amount")
    v4 = evolve_schema_commit(root, [("amount", "bigint")])
    ch2 = snapshot_changes(spark, root, v3, v4, ["id"])
    assert ch2.count() == 0, (
        "metadata-only ADD over identical files must produce an empty "
        "feed — spurious rows mean the old side resurrected dropped "
        "bytes through an untranslated mapping"
    )
    # and with real new data for the reused name, only the new rows
    # surface as inserts
    write_snapshot(
        spark.range(5, 7).selectExpr(
            "id", "CAST(100 + id AS BIGINT) AS amount"
        ),
        root,
        mode="append",
    )
    v5 = latest_version(root)
    ch3 = snapshot_changes(spark, root, v3, v5, ["id"])
    rows = {tuple(r) for r in ch3.select("op", "id", "amount").collect()}
    assert rows == {("I", 5, 105), ("I", 6, 106)}


def test_fileless_evolving_commit_cannot_resurrect(spark, tmp_path):
    """r11 review pass #3: the vectors-only exemption from the
    stage→commit guard must cover ONLY the prefix check — a commit with
    zero data files can still APPEND a schema field, and if that
    field's resolution collides with a retired physical the carried
    files would serve the dropped bytes. The collision check stays
    unconditional."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        CommitConflictError,
        commit,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS seg"),
        root,
    )
    drop_column_commit(root, "seg")
    pm = load_manifest(root, latest_version(root))
    import json as _json

    sdoc = _json.loads(pm["schema"])
    sdoc["fields"].append(
        {"name": "seg", "type": "string", "nullable": True, "metadata": {}}
    )
    staged = {
        "snapshot_dir": None,
        "files": [],
        "schema": _json.dumps(sdoc),
        "partition_by": list(pm["partition_by"]),
    }
    with pytest.raises(CommitConflictError, match="collide"):
        commit(root, staged, mode="append")
    assert latest_version(root) == 2
