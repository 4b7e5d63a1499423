"""Unit checks for the constraint suite (operators/quality.py) beyond
the planted-violation oracle (data_quality_orders): empty-table zeroes
and per-check semantics on micro-fixtures."""

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.quality import (
    check_accepted_values,
    check_foreign_key,
    check_not_null,
    check_unique,
    profile,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_empty_table_reports_zero_not_null_violations(spark):
    empty = spark.createDataFrame([], SCHEMA)
    rows = {r["check"]: r["n_violations"] for r in check_not_null(empty, ["k", "v"]).collect()}
    assert rows == {"not_null:k": 0, "not_null:v": 0}


def test_checks_on_micro_fixture(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "z")], SCHEMA
    )
    assert check_not_null(df, ["v"]).collect()[0]["n_violations"] == 1
    assert check_unique(df, ["k"]).collect()[0]["n_violations"] == 1
    assert check_accepted_values(df, "v", ["a", "b"]).collect()[0]["n_violations"] == 2
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    fk = check_foreign_key(df, "k", parent, "k")
    assert fk.collect()[0]["n_violations"] == 1  # k=3 orphan


def test_profile_counts(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (2, "a")], SCHEMA)
    rows = {r["col"]: r for r in profile(df).collect()}
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["n_distinct"] == 1


def test_profile_empty_table_reports_zero_nulls(spark):
    # F.sum over zero rows is NULL; profile must coalesce it to 0 like
    # check_not_null does (ADVICE r2).
    empty = spark.createDataFrame([], SCHEMA)
    rows = {r["col"]: r for r in profile(empty).collect()}
    assert rows["k"]["n_nulls"] == 0 and rows["v"]["n_nulls"] == 0
    assert rows["k"]["n_rows"] == 0 and rows["k"]["n_distinct"] == 0
