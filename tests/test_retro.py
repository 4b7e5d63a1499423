"""Unit semantics of retroactive history splicing (operators/retro.py)
on hand-built micro-dimensions: interval split, activeness inheritance,
prepend-before-history, replace-at-start, gap drop, no-op, and version
renumbering. The sf-scale value equivalence against DuckDB runs in
test_pytest_only_oracles (scd_retro_splice)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.retro import retro_splice
from implementing_scds_in_hive_spark.operators.scd import SCDConfig

EOT = datetime(2260, 12, 31, 23, 59, 59)

CFG = SCDConfig(
    key="k",
    type2_cols=("seg",),
    type1_cols=("name",),
    surrogate_col="dim_id",
    end_of_time="2260-12-31 23:59:59",
)

PROD_SCHEMA = T.StructType(
    [
        T.StructField("dim_id", T.LongType()),
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)

LATE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("seg", T.StringType()),
        T.StructField("eff_ts", T.TimestampType(), False),
    ]
)

JAN, MAR, JUN, SEP = (datetime(2024, m, 1) for m in (1, 3, 6, 9))


@pytest.fixture()
def prod(spark):
    rows = [
        # k=1: two versions [JAN, JUN) closed + [JUN, EOT) active
        (1, 1, "ann", "A1", 1, JAN, JUN, False),
        (2, 1, "ann", "A2", 2, JUN, EOT, True),
        # k=2: one active version [JUN, EOT)
        (3, 2, "bob", "B", 1, JUN, EOT, True),
        # k=3: coverage gap — [JAN, MAR) closed, deleted, [SEP, EOT) active
        (4, 3, "cat", "C1", 1, JAN, MAR, False),
        (5, 3, "cat", "C2", 2, SEP, EOT, True),
        # k=4: untouched
        (6, 4, "dan", "D", 1, JAN, EOT, True),
    ]
    return spark.createDataFrame(rows, PROD_SCHEMA)


def splice(spark, prod, late_rows):
    late = spark.createDataFrame(late_rows, LATE_SCHEMA)
    out = retro_splice(prod, late, CFG, key_strategy="row_number")
    rows = out.collect()
    return {(r["k"], r["scd_version"]): r for r in rows}, rows


def test_split_closed_interval(spark, prod):
    by_kv, rows = splice(spark, prod, [(1, "A1fix", datetime(2024, 2, 1))])
    # v1 truncated to [JAN, Feb), new piece [Feb, JUN), active stays v3
    assert by_kv[(1, 1)]["scd_end_date"] == datetime(2024, 2, 1)
    assert by_kv[(1, 1)]["scd_active"] is False
    piece = by_kv[(1, 2)]
    assert (piece["seg"], piece["scd_start_date"], piece["scd_end_date"]) == (
        "A1fix", datetime(2024, 2, 1), JUN,
    )
    assert piece["scd_active"] is False
    assert piece["name"] == "ann"  # Type-1 inherited from host version
    assert by_kv[(1, 3)]["seg"] == "A2"
    assert by_kv[(1, 3)]["scd_active"] is True


def test_split_active_interval_piece_becomes_active(spark, prod):
    by_kv, rows = splice(spark, prod, [(2, "B9", SEP)])
    assert by_kv[(2, 1)]["scd_end_date"] == SEP
    assert by_kv[(2, 1)]["scd_active"] is False
    assert by_kv[(2, 2)]["scd_active"] is True
    assert by_kv[(2, 2)]["scd_end_date"] == EOT
    assert by_kv[(2, 2)]["seg"] == "B9"


def test_prepend_before_history(spark, prod):
    by_kv, rows = splice(spark, prod, [(2, "B0", JAN)])
    pre = by_kv[(2, 1)]
    assert (pre["scd_start_date"], pre["scd_end_date"], pre["scd_active"]) == (
        JAN, JUN, False,
    )
    assert pre["name"] == "bob"  # Type-1 from the earliest version
    assert by_kv[(2, 2)]["scd_active"] is True  # original renumbered 1->2


def test_replace_at_exact_start(spark, prod):
    by_kv, rows = splice(spark, prod, [(2, "Bnew", JUN)])
    assert len([r for r in rows if r["k"] == 2]) == 1  # replaced, not split
    only = by_kv[(2, 1)]
    assert (only["seg"], only["scd_start_date"], only["scd_active"]) == (
        "Bnew", JUN, True,
    )


def test_gap_correction_is_dropped(spark, prod):
    by_kv, rows = splice(spark, prod, [(3, "ghost", JUN)])  # JUN in [MAR, SEP) gap
    assert len([r for r in rows if r["k"] == 3]) == 2  # unchanged
    assert by_kv[(3, 1)]["seg"] == "C1"
    assert by_kv[(3, 2)]["seg"] == "C2"


def test_noop_when_values_match(spark, prod):
    by_kv, rows = splice(spark, prod, [(1, "A2", SEP)])  # active already A2
    assert len([r for r in rows if r["k"] == 1]) == 2
    assert by_kv[(1, 2)]["scd_active"] is True


def test_untouched_keys_keep_rows_verbatim(spark, prod):
    by_kv, rows = splice(spark, prod, [(1, "A1fix", datetime(2024, 2, 1))])
    assert by_kv[(4, 1)]["seg"] == "D"
    assert by_kv[(4, 1)]["scd_active"] is True


def test_retro_splice_is_idempotent(spark, prod):
    """Re-splicing the same late row is a no-op: the second pass finds
    the containing piece already carrying the corrected values
    (differs = false)."""
    late = [(1, "A1fix", datetime(2024, 2, 1)), (2, "B0", JAN)]
    once = retro_splice(
        prod,
        spark.createDataFrame(late, LATE_SCHEMA),
        CFG,
        key_strategy="row_number",
    )
    twice = retro_splice(
        once,
        spark.createDataFrame(late, LATE_SCHEMA),
        CFG,
        key_strategy="row_number",
    )
    snap = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert snap(once) == snap(twice)


def test_intervals_stay_contiguous_and_versions_dense(spark, prod):
    _, rows = splice(spark, prod, [(1, "X", datetime(2024, 2, 1)), (2, "Y", JAN)])
    for key in (1, 2):
        vs = sorted((r for r in rows if r["k"] == key), key=lambda r: r["scd_version"])
        assert [r["scd_version"] for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a["scd_end_date"] == b["scd_start_date"]
        assert vs[-1]["scd_end_date"] == EOT
