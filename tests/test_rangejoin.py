"""Unit semantics + plan shape of the bucketized range join
(operators/rangejoin.py). Value equivalence against the plain predicate
join runs in test_pytest_only_oracles (range_join_events_promos)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.rangejoin import bucketized_range_join

FACT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)
IV_SCHEMA = T.StructType(
    [
        T.StructField("promo_id", T.LongType(), False),
        T.StructField("p_start", T.TimestampType(), False),
        T.StructField("p_end", T.TimestampType(), False),
    ]
)


def _join(spark, facts, ivs, **kw):
    f = spark.createDataFrame(facts, FACT_SCHEMA)
    i = spark.createDataFrame(ivs, IV_SCHEMA)
    kw.setdefault("granule_seconds", 3600)
    return bucketized_range_join(
        f, i, ts_col="ts", start_col="p_start", end_col="p_end", **kw
    )


H = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731


def test_half_open_boundaries(spark):
    ivs = [(1, H(10), H(12))]
    facts = [(1, H(10)), (2, H(11, 59)), (3, H(12)), (4, H(9, 59))]
    got = {r["event_id"] for r in _join(spark, facts, ivs).collect()}
    assert got == {1, 2}  # start inclusive, end exclusive


def test_interval_spanning_many_granules_and_overlaps(spark):
    ivs = [(1, H(1), H(5)), (2, H(3), H(4))]  # overlap at hour 3
    facts = [(1, H(3, 30)), (2, H(4, 30)), (3, H(0, 30))]
    rows = {(r["event_id"], r["promo_id"]) for r in _join(spark, facts, ivs).collect()}
    assert rows == {(1, 1), (1, 2), (2, 1)}


def test_sub_granule_interval_inside_one_bucket(spark):
    ivs = [(1, H(10, 15), H(10, 45))]
    facts = [(1, H(10, 30)), (2, H(10, 50))]
    got = {r["event_id"] for r in _join(spark, facts, ivs).collect()}
    assert got == {1}


def test_left_join_keeps_unmatched_facts_once(spark):
    ivs = [(1, H(1), H(5))]
    facts = [(1, H(2)), (2, H(22))]
    rows = _join(spark, facts, ivs, join_type="left").collect()
    assert len(rows) == 2
    by_id = {r["event_id"]: r for r in rows}
    assert by_id[1]["promo_id"] == 1
    assert by_id[2]["promo_id"] is None


def test_overlapping_column_names_rejected(spark):
    f = spark.createDataFrame([(1, H(1))], FACT_SCHEMA)
    bad = f.withColumnRenamed("event_id", "promo_id")
    i = spark.createDataFrame([(1, H(1), H(2))], IV_SCHEMA)
    with pytest.raises(ValueError, match="disjoint"):
        bucketized_range_join(bad, i, ts_col="ts", start_col="p_start", end_col="p_end")


def test_plan_is_hash_join_not_nested_loop(spark):
    f = spark.createDataFrame([(i, H(i % 24)) for i in range(100)], FACT_SCHEMA)
    i = spark.createDataFrame([(1, H(1), H(5))], IV_SCHEMA)
    out = bucketized_range_join(
        f, i, ts_col="ts", start_col="p_start", end_col="p_end"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan
