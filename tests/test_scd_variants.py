"""Unit semantics of SCD Types 3 and 6 (operators/scd_variants.py).
sf-scale value equivalence runs in test_pytest_only_oracles
(scd3_merge_customer / scd6_current_columns)."""

from datetime import datetime

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig
from implementing_scds_in_hive_spark.operators.scd_variants import (
    add_current_columns,
    scd3_merge,
)

T0 = datetime(2024, 1, 1)
AS_OF = datetime(2024, 7, 1)
EOT = datetime(2260, 12, 31, 23, 59, 59)

CFG = SCDConfig(
    key="k",
    type2_cols=("seg", "bal"),
    type1_cols=("name",),
    surrogate_col="dim_id",
    end_of_time="2260-12-31 23:59:59",
)

P3_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("bal", T.DoubleType()),
        T.StructField("prev_seg", T.StringType()),
        T.StructField("prev_bal", T.DoubleType()),
        T.StructField("last_modified", T.TimestampType()),
    ]
)
STG_SCHEMA = "k long, name string, seg string, bal double"


def test_scd3_shifts_only_changed_shadows(spark):
    prod = spark.createDataFrame(
        [
            (1, "ann", "A", 10.0, "A0", None, T0),  # seg changed before
            (2, "bob", "B", 20.0, None, None, T0),
        ],
        P3_SCHEMA,
    )
    stg = spark.createDataFrame(
        [(1, "ann", "A", 99.0), (2, "bob", "B2", 20.0)], STG_SCHEMA
    )
    out = {r["k"]: r for r in scd3_merge(prod, stg, CFG, AS_OF).collect()}
    # k=1: only bal changed -> prev_bal shifts, prev_seg PRESERVED
    assert out[1]["bal"] == 99.0 and out[1]["prev_bal"] == 10.0
    assert out[1]["seg"] == "A" and out[1]["prev_seg"] == "A0"
    assert out[1]["last_modified"] == AS_OF
    # k=2: only seg changed -> prev_seg shifts, prev_bal stays NULL
    assert out[2]["seg"] == "B2" and out[2]["prev_seg"] == "B"
    assert out[2]["prev_bal"] is None and out[2]["bal"] == 20.0


def test_scd3_carry_new_and_unchanged(spark):
    prod = spark.createDataFrame(
        [(1, "ann", "A", 10.0, None, None, T0), (3, "cat", "C", 30.0, "C0", 3.0, T0)],
        P3_SCHEMA,
    )
    stg = spark.createDataFrame(
        [(1, "ann2", "A", 10.0), (9, "eve", "E", 90.0)], STG_SCHEMA
    )
    out = {r["k"]: r for r in scd3_merge(prod, stg, CFG, AS_OF).collect()}
    # unchanged tracked cols: Type-1 rewrite only, timestamp untouched
    assert out[1]["name"] == "ann2" and out[1]["last_modified"] == T0
    # absent from staging: carried verbatim, shadows intact
    assert out[3]["prev_seg"] == "C0" and out[3]["prev_bal"] == 3.0
    # new key: NULL shadows, stamped now
    assert out[9]["prev_seg"] is None and out[9]["last_modified"] == AS_OF
    assert len(out) == 3


def test_scd3_plan_is_broadcast_only(spark):
    prod = spark.createDataFrame([(1, "ann", "A", 10.0, None, None, T0)], P3_SCHEMA)
    stg = spark.createDataFrame([(1, "ann", "B", 10.0)], STG_SCHEMA)
    plan = scd3_merge(prod, stg, CFG, AS_OF)._jdf.queryExecution().executedPlan().toString()
    # the production-branch join must be the broadcast one (production
    # rows stream map-side); the key-only anti-join may shuffle keys
    # when stats don't justify auto-broadcast — same contract as the
    # flagship merge.
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


DIM_SCHEMA = T.StructType(
    [
        T.StructField("dim_id", T.LongType()),
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("bal", T.DoubleType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)


def test_scd6_current_values_on_history_rows(spark):
    dim = spark.createDataFrame(
        [
            (1, 1, "ann", "A1", 1.0, 1, T0, AS_OF, False),
            (2, 1, "ann", "A2", 2.0, 2, AS_OF, EOT, True),
            (3, 2, "bob", None, 5.0, 1, T0, EOT, True),  # NULL active value
            (4, 3, "cat", "C", 7.0, 1, T0, AS_OF, False),  # no active row
        ],
        DIM_SCHEMA,
    )
    out = {(r["k"], r["scd_version"]): r for r in add_current_columns(dim, CFG).collect()}
    assert out[(1, 1)]["cur_seg"] == "A2"  # history row sees current value
    assert out[(1, 1)]["cur_bal"] == 2.0
    assert out[(1, 2)]["cur_seg"] == "A2"
    assert out[(2, 1)]["cur_seg"] is None  # active value IS null
    assert out[(3, 1)]["cur_seg"] is None  # deleted key: no current
    assert out[(3, 1)]["cur_bal"] is None
