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


# --- MAD outliers --------------------------------------------------------

def test_mad_outlier_stats_matches_reference(spark):
    import statistics

    from implementing_scds_in_hive_spark.operators.quality import (
        flag_mad_outliers,
        mad_outlier_stats,
    )

    vals = [10.0, 11.0, 9.5, 10.5, 10.2, 9.8, 10.1, 500.0, -300.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = mad_outlier_stats(df, "x").collect()[0]
    med = statistics.median(vals)
    mad = statistics.median(abs(v - med) for v in vals)
    assert row["median"] == med and row["mad"] == mad
    lo, hi = med - 3.5 * 1.4826 * mad, med + 3.5 * 1.4826 * mad
    assert row["lo"] == lo and row["hi"] == hi
    assert row["n_outliers"] == sum(1 for v in vals if v < lo or v > hi) == 2

    flags = {r["x"]: r["is_outlier"] for r in flag_mad_outliers(df, "x").collect()}
    assert flags[500.0] and flags[-300.0] and not flags[10.0]


def test_mad_is_contamination_robust_where_zscore_is_not(spark):
    """The reason MAD exists: 20% wild contamination barely moves the
    fences (clean inliers stay inside), while the mean/stddev z-fence is
    dragged so far every contaminant looks normal."""
    from implementing_scds_in_hive_spark.operators.quality import mad_outlier_stats
    from pyspark.sql import functions as F

    clean = [float(v) for v in range(100, 140)]
    dirty = clean + [1e7] * 10  # 20% contamination
    df = spark.createDataFrame([(v,) for v in dirty], "x double")
    row = mad_outlier_stats(df, "x").collect()[0]
    assert row["n_outliers"] == 10  # every contaminant caught
    assert row["lo"] < 100 and row["hi"] < 1000  # fences stayed near data
    # z-score contrast: mean/std fence swallows the contamination
    stats = df.agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("s")).collect()[0]
    z_hi = stats["m"] + 3.5 * stats["s"]
    assert all(1e7 <= z_hi or v <= z_hi for v in dirty)
    assert 1e7 < z_hi  # the contaminant sits INSIDE the naive fence


def test_mad_grouped_fences_are_independent(spark):
    from implementing_scds_in_hive_spark.operators.quality import mad_outlier_stats

    rows = [("a", float(v)) for v in range(10)] + [("b", float(v * 1000)) for v in range(10)]
    rows += [("a", 9999.0)]  # outlier only under group a's fence
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r["g"]: r["n_outliers"] for r in mad_outlier_stats(df, "x", group_cols=["g"]).collect()}
    assert out == {"a": 1, "b": 0}

def test_flag_mad_outliers_keeps_null_key_rows(spark):
    """r11 review: NULL group keys vanished from the flagged output
    (USING joins never match NULL); the contract is input + flag, 1:1."""
    from implementing_scds_in_hive_spark.operators.quality import (
        flag_mad_outliers,
        mad_outlier_stats,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 100.0), (None, 5.0), (None, 6.0)],
        "region string, amount double",
    )
    flagged = flag_mad_outliers(df, "amount", group_cols=["region"])
    assert flagged.count() == df.count()
    assert flagged.where("region IS NULL").count() == 2
    stats = mad_outlier_stats(df, "amount", group_cols=["region"])
    assert stats.where("region IS NULL").count() == 1
