"""Multi-clause MERGE chains (r9, Delta parity): first-match-wins
LISTS of WHEN MATCHED / WHEN NOT MATCHED / WHEN NOT MATCHED BY SOURCE
clauses — ``when_matched=[{"action": "update"|"delete", "condition":
..., "set": {...}}, ...]`` etc. The scalar params remain as sugar that
normalizes to single-clause chains, so every prior call shape is
unchanged. Reference semantics computed independently row by row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dml import merge_into
from implementing_scds_in_hive_spark.sources.snapshot import (
    read_table,
    write_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _publish(spark, root, rows):
    write_snapshot(
        spark.createDataFrame(rows, "id long, v double, status string")
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id"),
        root,
        stats_cols=["id"],
    )


@pytest.mark.parametrize("tier", ["cow", "mor"])
def test_matched_chain_first_match_wins(spark, tmp_path, tier):
    """Three matched clauses in order: conditional update, conditional
    delete, unconditional fallback update. Each matched row fires
    exactly the FIRST clause whose condition is TRUE (3VL: NULL
    conditions fall through)."""
    root = str(tmp_path / "t")
    rows = [
        (1, 5.0, "A"),     # fires clause 0 (v < 10)
        (2, 50.0, "A"),    # clause 0 false, clause 1 (v < 100) -> delete
        (3, 500.0, "A"),   # falls to clause 2 fallback
        (4, None, "A"),    # both conditions NULL -> fallback
        (9, 1.0, "A"),     # not in source: untouched
    ]
    _publish(spark, root, rows)
    src = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 100.0)],
        "id long, nv double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["id"],
        when_matched=[
            {"action": "update", "condition": "t.v < 10",
             "set": {"v": "s.nv", "status": "'LOW'"}},
            {"action": "delete", "condition": "t.v < 100"},
            {"action": "update", "set": {"status": "'HIGH'"}},
        ],
        when_not_matched_insert=None,
        tier=tier,
    )
    assert rep["rows_updated"] == 3 and rep["rows_deleted"] == 1
    assert _rows(read_table(spark, root)) == [
        (1, 100.0, "LOW"),
        (3, 500.0, "HIGH"),
        (4, None, "HIGH"),
        (9, 1.0, "A"),
    ]


def test_insert_chain_and_nbs_chain(spark, tmp_path):
    """Multiple conditional inserts (first match wins; rows matching no
    insert clause are NOT inserted) and a three-clause NBS chain."""
    root = str(tmp_path / "t")
    _publish(
        spark, root,
        [(1, 10.0, "A"), (2, 200000.0, "A"), (3, 30.0, "A")],
    )
    src = spark.createDataFrame(
        [(1, 1.0), (11, 5.0), (12, -5.0), (13, None)],
        "id long, nv double",
    )
    rep = merge_into(
        spark,
        root,
        src,
        ["id"],
        when_matched_update={"v": "s.nv"},
        when_not_matched=[
            {"condition": "s.nv > 0",
             "values": {"id": "s.id", "v": "s.nv", "status": "'POS'"}},
            {"condition": "s.nv < 0",
             "values": {"id": "s.id", "v": "-s.nv", "status": "'NEG'"}},
            # no fallback: NULL nv inserts nothing
        ],
        when_not_matched_by_source=[
            {"action": "update", "condition": "t.v >= 100000",
             "set": {"status": "'BIG'"}},
            {"action": "delete", "condition": "t.v < 25"},
            {"action": "update", "set": {"status": "'S'"}},
        ],
    )
    assert rep["rows_inserted"] == 2
    # target: 1 matched-updated; 2 NBS 'BIG'; 3 NBS fallback 'S'
    assert rep["rows_updated"] == 3 and rep["rows_deleted"] == 0
    assert _rows(read_table(spark, root)) == [
        (1, 1.0, "A"),
        (2, 200000.0, "BIG"),
        (3, 30.0, "S"),
        (11, 5.0, "POS"),
        (12, 5.0, "NEG"),
    ]


def test_chain_validation_and_scalar_exclusivity(spark, tmp_path):
    root = str(tmp_path / "t")
    _publish(spark, root, [(1, 1.0, "A")])
    src = spark.createDataFrame([(1, 2.0)], "id long, nv double")
    with pytest.raises(ValueError, match="not both"):
        merge_into(
            spark, root, src, ["id"],
            when_matched=[{"action": "delete"}],
            when_matched_update={"v": "s.nv"},
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="action"):
        merge_into(
            spark, root, src, ["id"],
            when_matched=[{"action": "upsert"}],
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(
            spark, root, src, ["id"],
            when_matched=[{"action": "update", "set": {"nope": "1"}}],
            when_not_matched_insert=None,
        )
    # NBS chains reject source references like the scalar form
    with pytest.raises(ValueError, match="references source columns"):
        merge_into(
            spark, root, src, ["id"],
            when_not_matched_by_source=[
                {"action": "update", "set": {"v": "s.nv"}},
            ],
            when_not_matched_insert=None,
        )
    # updating an ON key inside a chain clause raises
    with pytest.raises(ValueError, match="ON key"):
        merge_into(
            spark, root, src, ["id"],
            when_matched=[{"action": "update", "set": {"id": "s.id"}}],
            when_not_matched_insert=None,
        )


def test_sql_face_multi_clause_chains(spark, tmp_path):
    """The SQL face maps Delta-style clause CHAINS in textual order —
    several conditional WHEN MATCHED and WHEN NOT MATCHED clauses in
    one statement."""
    from implementing_scds_in_hive_spark.operators.sql_dml import run_sql

    root = str(tmp_path / "t")
    _publish(
        spark, root,
        [(1, 5.0, "A"), (2, 50.0, "A"), (3, 500.0, "A")],
    )
    src = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0), (11, 7.0), (12, -7.0)],
        "id long, nv double",
    )
    rep = run_sql(
        spark,
        """MERGE INTO t USING s ON t.id = s.id
           WHEN MATCHED AND t.v < 10 THEN UPDATE SET status = 'LOW'
           WHEN MATCHED AND t.v < 100 THEN DELETE
           WHEN MATCHED THEN UPDATE SET status = 'HIGH'
           WHEN NOT MATCHED AND s.nv > 0 THEN
               INSERT (id, v, status) VALUES (s.id, s.nv, 'POS')
           WHEN NOT MATCHED THEN
               INSERT (id, v, status) VALUES (s.id, -s.nv, 'NEG')""",
        {"t": root, "s": src},
    )
    assert rep["rows_updated"] == 2
    assert rep["rows_deleted"] == 1
    assert rep["rows_inserted"] == 2
    assert _rows(read_table(spark, root)) == [
        (1, 5.0, "LOW"),
        (3, 500.0, "HIGH"),
        (11, 7.0, "POS"),
        (12, 7.0, "NEG"),
    ]


def test_scalar_forms_unchanged_vs_chain_equivalent(spark, tmp_path):
    """The scalar sugar (delete evaluated first, update_condition
    gating) is EXACTLY the two-clause chain [delete(cond),
    update(cond)] — pinned so the normalization cannot drift."""
    rows = [(i, float(i * 7 % 23), "A") for i in range(1, 30)]
    src = None
    outs = []
    for form in ("scalar", "chain"):
        root = str(tmp_path / form)
        _publish(spark, root, rows)
        if src is None:
            src = spark.createDataFrame(
                [(i, float(i % 5)) for i in range(1, 40, 2)],
                "id long, nv double",
            )
        kw = (
            dict(
                when_matched_update={"v": "t.v + s.nv"},
                when_matched_delete="t.v < 5",
                update_condition="s.nv > 1",
            )
            if form == "scalar"
            else dict(
                when_matched=[
                    {"action": "delete", "condition": "t.v < 5"},
                    {"action": "update", "condition": "s.nv > 1",
                     "set": {"v": "t.v + s.nv"}},
                ]
            )
        )
        merge_into(
            spark, root, src, ["id"],
            when_not_matched_insert={"id": "s.id", "v": "s.nv"},
            **kw,
        )
        outs.append(_rows(read_table(spark, root)))
    assert outs[0] == outs[1]
