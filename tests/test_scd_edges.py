"""Edge-path tests for the SCD merge API: schema validation, staging
batches missing Type-1 columns, the staging dedup guard, and the
two_pass key strategy on the real customer fixture."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    dedupe_staging,
    scd2_merge,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)

T0 = datetime(2024, 1, 1)
EOT = datetime(9999, 12, 31, 23, 59, 59)

CFG = SCDConfig(key="k", type2_cols=("v",), type1_cols=("nm",), surrogate_col="dim_id")
PROD_DDL = (
    "dim_id long, k string, v string, nm string, scd_version int, "
    "scd_start_date timestamp, scd_end_date timestamp, scd_active boolean"
)


def _prod(spark):
    return spark.createDataFrame(
        [(1, "a", "v1", "n1", 1, T0, EOT, True)], PROD_DDL
    )


def test_missing_meta_columns_rejected(spark):
    bad_prod = spark.createDataFrame([("a", "v1")], "k string, v string")
    stg = spark.createDataFrame([("a", "v2", "n")], "k string, v string, nm string")
    with pytest.raises(ValueError, match="lacks columns"):
        scd2_merge(bad_prod, stg, CFG, T0)


def test_staging_missing_type1_column_carries_production_value(spark):
    """A staging feed without a Type-1 column must not null it out —
    the production value is carried."""
    stg = spark.createDataFrame([("a", "v2")], "k string, v string")  # no nm
    out = scd2_merge(_prod(spark), stg, CFG, datetime(2024, 2, 1))
    rows = {r["scd_version"]: r.asDict() for r in out.collect()}
    assert rows[1]["nm"] == "n1" and rows[1]["scd_active"] is False
    assert rows[2]["v"] == "v2" and rows[2]["nm"] is None  # new version: staging truth
    # (the new version takes staging values only; absent columns are NULL
    # by design — callers supply full business columns for Type-2 feeds)


def test_dedupe_staging_keeps_last_by_order(spark):
    stg = spark.createDataFrame(
        [("a", "v-old", "n", 1), ("a", "v-new", "n", 2), ("b", "v", "n", 1)],
        "k string, v string, nm string, seq int",
    )
    out = dedupe_staging(stg, CFG, order_by=["seq"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "v-new", "b": "v"}


def test_duplicate_staging_keys_would_fan_out_without_guard(spark):
    """Documents the implicit precondition (SURVEY §0): ungated duplicate
    keys fan the join out; the guard restores one-row-per-key."""
    dup = spark.createDataFrame(
        [("a", "v2", "n"), ("a", "v3", "n")], "k string, v string, nm string"
    )
    fanned = scd2_merge(_prod(spark), dup, CFG, datetime(2024, 2, 1))
    assert fanned.count() > 2  # fan-out: why the guard exists
    guarded = scd2_merge(
        _prod(spark), dedupe_staging(dup, CFG), CFG, datetime(2024, 2, 1)
    )
    assert guarded.count() == 2


def test_two_pass_keys_on_customer_fixture(spark, sf_dir):
    """two_pass assigns exactly the same dense key sequence as the
    row_number parity mode on real fixture data."""
    prod = customer_production(spark, sf_dir)
    stg = customer_staging(spark, sf_dir)
    a = scd2_merge(prod, stg, CUSTOMER_CFG, AS_OF, key_strategy="row_number")
    b = scd2_merge(prod, stg, CUSTOMER_CFG, AS_OF, key_strategy="two_pass")
    key = ["scd_start_date", "c_custkey", "scd_version"]
    ka = [r["dim_customer_id"] for r in a.orderBy(*key).collect()]
    kb = [r["dim_customer_id"] for r in b.orderBy(*key).collect()]
    assert ka == kb and ka == list(range(1, len(ka) + 1))


def _dedupe_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_dedupe_staging_auto_routes_by_hint_each_side_of_crossover(spark):
    """r14 (VERDICT r13 next-round #5): strategy="auto" must pick the
    skew-immune max_by formulation above the crossover threshold and the
    window formulation below it — asserted on the physical plan (the
    window plan contains a Window node; the max_by plan partial-
    aggregates with no Window), with identical output either way."""
    from implementing_scds_in_hive_spark.operators.scd import dedupe_staging

    stg = spark.createDataFrame(
        [("a", "v1", "n", 1), ("a", "v2", "n", 2), ("b", "v", "n", 1)],
        "k string, v string, nm string, seq int",
    )
    hot = dedupe_staging(
        stg, CFG, order_by=["seq"], strategy="auto",
        rows_per_key_hint=1_000_000,
    )
    assert "Window" not in _dedupe_plan(hot)
    assert "max_by" in _dedupe_plan(hot)
    cold = dedupe_staging(
        stg, CFG, order_by=["seq"], strategy="auto", rows_per_key_hint=10
    )
    assert "Window" in _dedupe_plan(cold)
    rows = lambda df: sorted((r["k"], r["v"]) for r in df.collect())  # noqa: E731
    assert rows(hot) == rows(cold) == [("a", "v2"), ("b", "v")]


def test_dedupe_staging_auto_probe_detects_planted_hot_key(spark):
    """The probe path (no hint): a planted redelivered key above a
    small threshold routes to max_by unprompted; the same corpus under
    a high threshold keeps the window plan. probe_fraction=None makes
    the tiny-corpus probe exact."""
    from implementing_scds_in_hive_spark.operators.scd import dedupe_staging

    rows = [("hot", f"v{i}", "n", i) for i in range(500)] + [
        ("cold", "v", "n", 1)
    ]
    stg = spark.createDataFrame(rows, "k string, v string, nm string, seq int")
    routed = dedupe_staging(
        stg, CFG, order_by=["seq"], strategy="auto",
        skew_threshold=100, probe_fraction=None,
    )
    assert "Window" not in _dedupe_plan(routed)
    got = {r["k"]: r["v"] for r in routed.collect()}
    assert got == {"hot": "v499", "cold": "v"}
    unrouted = dedupe_staging(
        stg, CFG, order_by=["seq"], strategy="auto",
        skew_threshold=10_000, probe_fraction=None,
    )
    assert "Window" in _dedupe_plan(unrouted)
    assert {r["k"]: r["v"] for r in unrouted.collect()} == got
