"""Schema-evolution semantics of scd2_merge(evolve_schema=True):
Type-1 evolution backfills NULL and rewrites; Type-2 evolution treats a
non-null incoming value as a change against the NULL backfill (and a
NULL incoming value as no change); without the flag the column contract
still raises. The sf-scale value equivalence runs in
test_pytest_only_oracles (scd_evolve_merge)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge

EOT = datetime(2260, 12, 31, 23, 59, 59)
T0 = datetime(2024, 1, 1)
AS_OF = datetime(2024, 7, 1)

CFG = SCDConfig(
    key="k",
    type2_cols=("seg", "tier"),  # 'tier' does not exist in prod yet
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

STG_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("tier", T.StringType()),
    ]
)


@pytest.fixture()
def prod(spark):
    rows = [
        (1, 1, "ann", "A", 1, T0, EOT, True),  # staged with tier -> change
        (2, 2, "bob", "B", 1, T0, EOT, True),  # staged with NULL tier -> no-op
        (3, 3, "cat", "C", 1, T0, EOT, True),  # absent from staging -> carried
    ]
    return spark.createDataFrame(rows, PROD_SCHEMA)


def test_missing_column_still_raises_without_flag(spark, prod):
    stg = spark.createDataFrame([(1, "ann", "A", "gold")], STG_SCHEMA)
    with pytest.raises(ValueError, match="tier"):
        scd2_merge(prod, stg, CFG, AS_OF)


def test_evolved_type2_column_semantics(spark, prod):
    stg = spark.createDataFrame(
        [(1, "ann", "A", "gold"), (2, "bob", "B", None)], STG_SCHEMA
    )
    out = scd2_merge(prod, stg, CFG, AS_OF, evolve_schema=True, key_strategy="row_number")
    assert "tier" in out.columns
    rows = {(r["k"], r["scd_version"]): r for r in out.collect()}
    # k=1: non-null incoming tier vs NULL backfill IS a change
    assert rows[(1, 1)]["scd_active"] is False
    assert rows[(1, 1)]["scd_end_date"] == AS_OF
    assert rows[(1, 1)]["tier"] is None  # close-out keeps prod Type-2 values
    assert rows[(1, 2)]["tier"] == "gold"
    assert rows[(1, 2)]["scd_active"] is True
    # k=2: NULL incoming tier equals NULL backfill -> Type-1 rewrite only
    assert rows[(2, 1)]["scd_active"] is True
    assert rows[(2, 1)]["tier"] is None
    # k=3: carried with NULL backfill
    assert rows[(3, 1)]["tier"] is None
    assert rows[(3, 1)]["scd_active"] is True


def test_evolved_column_on_brand_new_key(spark, prod):
    stg = spark.createDataFrame([(9, "eve", "E", "silver")], STG_SCHEMA)
    out = scd2_merge(prod, stg, CFG, AS_OF, evolve_schema=True, key_strategy="row_number")
    rows = {(r["k"], r["scd_version"]): r for r in out.collect()}
    assert rows[(9, 1)]["tier"] == "silver"
    assert rows[(9, 1)]["scd_active"] is True


def test_full_outer_plan_also_evolves(spark, prod):
    stg = spark.createDataFrame([(1, "ann", "A", "gold")], STG_SCHEMA)
    a = scd2_merge(prod, stg, CFG, AS_OF, evolve_schema=True,
                   plan="full_outer", key_strategy="row_number")
    b = scd2_merge(prod, stg, CFG, AS_OF, evolve_schema=True,
                   plan="broadcast", key_strategy="row_number")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
