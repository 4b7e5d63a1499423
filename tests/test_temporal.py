"""Unit semantics of the per-row temporal join (operators/temporal.py).
sf-scale value equivalence runs in test_pytest_only_oracles
(scd_temporal_join)."""

from datetime import datetime

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig
from implementing_scds_in_hive_spark.operators.temporal import temporal_join

CFG = SCDConfig(
    key="k",
    type2_cols=("seg",),
    type1_cols=(),
    surrogate_col="dim_id",
    end_of_time="2260-12-31 23:59:59",
)

JAN, MAR, JUN = datetime(2024, 1, 1), datetime(2024, 3, 1), datetime(2024, 6, 1)
EOT = datetime(2260, 12, 31, 23, 59, 59)

DIM_SCHEMA = T.StructType(
    [
        T.StructField("dim_id", T.LongType()),
        T.StructField("k", T.LongType(), False),
        T.StructField("seg", T.StringType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)


def _dim(spark):
    rows = [
        (1, 1, "OLD", 1, JAN, MAR, False),
        (2, 1, "NEW", 2, MAR, EOT, True),
        # k=2 deleted during [MAR, JUN): gap
        (3, 2, "B1", 1, JAN, MAR, False),
        (4, 2, "B2", 2, JUN, EOT, True),
    ]
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_each_fact_gets_its_eras_version(spark):
    facts = _facts(
        spark,
        [(1, 1, datetime(2024, 2, 15)), (2, 1, datetime(2024, 5, 1)), (3, 1, MAR)],
    )
    out = temporal_join(
        facts, _dim(spark), CFG, fact_key="user_id", ts_col="ts",
        dim_cols=["seg", "scd_version"],
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["seg"] == "OLD"
    assert rows[2]["seg"] == "NEW"
    assert rows[3]["seg"] == "NEW"  # boundary: start inclusive, end exclusive
    assert len(rows) == 3  # disjoint intervals -> no fan-out


def test_left_join_keeps_gap_and_unknown_facts(spark):
    facts = _facts(
        spark,
        [(1, 2, datetime(2024, 4, 1)), (2, 99, datetime(2024, 4, 1)), (3, 2, JUN)],
    )
    out = temporal_join(
        facts, _dim(spark), CFG, fact_key="user_id", ts_col="ts",
        dim_cols=["seg"], how="left",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["seg"] is None  # deleted-era gap
    assert rows[2]["seg"] is None  # unknown key
    assert rows[3]["seg"] == "B2"


def test_plan_is_hash_join(spark):
    facts = _facts(spark, [(1, 1, MAR)])
    out = temporal_join(
        facts, _dim(spark), CFG, fact_key="user_id", ts_col="ts", dim_cols=["seg"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan
