"""Script-vs-engine equivalence: the reference's literal 8-statement
workflow (/root/reference/SCD_script.txt:3-155), generated and executed
as multi-statement Spark SQL by ``operators/sql_script.py``, produces
row-identical output to the single-pass engine plan
(``operators/scd.scd2_merge`` with ``key_strategy='row_number'``).

Fixtures: the reference's golden dim_user example
(/root/reference/README.md:55-88) and the TPC-H-derived customer fixture
(plans/scd_fixtures.py) at sf0.001 — every branch of steps 2-7 is
exercised (carry, inactive rewrite, unchanged rewrite, close-out, new
version, brand-new key). Exact row compare including surrogate keys:
both paths order the re-key by the same deterministic
``(start, key, version)`` total order, so even the keys must agree.
"""

from datetime import datetime

import pytest

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge
from implementing_scds_in_hive_spark.operators.sql_script import (
    cleanup_script_tables,
    run_scd2_script,
)
from implementing_scds_in_hive_spark.plans.scd_fixtures import (
    AS_OF,
    CUSTOMER_CFG,
    customer_production,
    customer_staging,
)
from tests.test_scd_golden import CFG as GOLDEN_CFG
from tests.test_scd_golden import EOT, PROD_SCHEMA, STG_SCHEMA, T0

GOLDEN_AS_OF = "2024-05-01 12:00:00"


def all_rows(df):
    cols = sorted(df.columns)
    # repr-keyed sort: total order even with NULLs in the tuples
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def assert_identical(script_df, engine_df):
    assert sorted(script_df.columns) == sorted(engine_df.columns)
    assert all_rows(script_df) == all_rows(engine_df)


def golden_inputs(spark):
    prod = spark.createDataFrame(
        [
            (1, "user1", True, "address1", "123456789", "John", "Doe", 1980, 1, T0, EOT, True),
            (2, "user2", False, "address2", None, "Alice", "Smith", 1990, 1, T0, EOT, True),
        ],
        PROD_SCHEMA,
    )
    staging = spark.createDataFrame(
        [
            ("user1", "John", "Doe", 1985, True, "address1", "987654321"),
            ("user2", "Alice", "Smith", 1990, True, "address2", None),
            ("user3", "Emma", "Johnson", 1985, True, "address3", "987654321"),
        ],
        STG_SCHEMA,
    )
    return prod, staging


def test_script_equals_engine_on_golden_example(spark):
    prod, staging = golden_inputs(spark)
    engine = scd2_merge(prod, staging, GOLDEN_CFG, GOLDEN_AS_OF, key_strategy="row_number")
    script = run_scd2_script(
        spark, prod, staging, GOLDEN_CFG, GOLDEN_AS_OF, name_prefix="tscript_golden"
    )
    try:
        assert script.count() == 5
        assert_identical(script, engine)
    finally:
        cleanup_script_tables(spark, "tscript_golden")


def test_script_equals_engine_on_customer_fixture(spark, sf_dir):
    prod = customer_production(spark, sf_dir)
    staging = customer_staging(spark, sf_dir)
    engine = scd2_merge(prod, staging, CUSTOMER_CFG, AS_OF, key_strategy="row_number")
    script = run_scd2_script(
        spark, prod, staging, CUSTOMER_CFG, AS_OF, name_prefix="tscript_cust"
    )
    try:
        assert script.count() > 0
        assert_identical(script, engine)
    finally:
        cleanup_script_tables(spark, "tscript_cust")


def test_script_keeps_null_active_rows_like_engine(spark):
    """Three-valued-logic edge (ADVICE r3): a production row with NULL
    scd_active for a staged key must not be silently dropped by the
    script's WHERE branches. The engine's F.when chain falls through
    NULL into the active-row logic; the script's COALESCE(active, TRUE)
    must reproduce that, on both the changed and unchanged sides."""
    prod = spark.createDataFrame(
        [
            # NULL active, Type-2 change staged -> close-out + new version
            (1, "nullch", True, "a1", "111", "N", "C", 1970, 3, T0, EOT, None),
            # NULL active, no Type-2 change -> Type-1 rewrite, row kept
            (2, "nullsame", False, "a2", None, "N", "S", 1971, 1, T0, EOT, None),
        ],
        PROD_SCHEMA,
    )
    staging = spark.createDataFrame(
        [
            ("nullch", "New", "C", 1970, False, "a1", "111"),
            ("nullsame", "New", "S", 1971, False, "a2", None),
        ],
        STG_SCHEMA,
    )
    engine = scd2_merge(prod, staging, GOLDEN_CFG, GOLDEN_AS_OF, key_strategy="row_number")
    script = run_scd2_script(
        spark, prod, staging, GOLDEN_CFG, GOLDEN_AS_OF, name_prefix="tscript_null"
    )
    try:
        # no row lost: changed key -> 2 rows, unchanged key -> 1 row
        assert script.where("login = 'nullch'").count() == 2
        assert script.where("login = 'nullsame'").count() == 1
        assert_identical(script, engine)
    finally:
        cleanup_script_tables(spark, "tscript_null")


def test_cleanup_drops_tables_and_views(spark):
    prod, staging = golden_inputs(spark)
    run_scd2_script(
        spark, prod, staging, GOLDEN_CFG, GOLDEN_AS_OF, name_prefix="tscript_clean"
    ).count()
    cleanup_script_tables(spark, "tscript_clean")
    names = {t.name for t in spark.catalog.listTables()}
    leftovers = {n for n in names if n.startswith("tscript_clean")}
    assert leftovers == set()


# ---------------------------------------------------------------------------
# Property: script == engine on RANDOM batch sequences (reusing the SCD
# property suite's generators — tiny value pools force no-change
# batches, NULL Type-2 transitions, and multi-merge version chains).
# ---------------------------------------------------------------------------

from datetime import timedelta

from hypothesis import HealthCheck, given, settings

from tests.test_scd_properties import (
    BATCHES,
    CFG as PROP_CFG,
    PROD_SCHEMA as PROP_PROD_SCHEMA,
    STG_SCHEMA as PROP_STG_SCHEMA,
    T0 as PROP_T0,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_script_equals_engine_on_random_batches(spark, batches):
    prod_engine = spark.createDataFrame([], PROP_PROD_SCHEMA)
    prod_script = spark.createDataFrame([], PROP_PROD_SCHEMA)
    try:
        for i, batch in enumerate(batches):
            stg = spark.createDataFrame(batch, PROP_STG_SCHEMA)
            as_of = (PROP_T0 + timedelta(days=i)).strftime("%Y-%m-%d %H:%M:%S")
            prod_engine = scd2_merge(
                prod_engine, stg, PROP_CFG, as_of, key_strategy="row_number"
            )
            prod_script = run_scd2_script(
                spark, prod_script, stg, PROP_CFG, as_of, name_prefix="tscript_prop"
            )
            # each path consumes ITS OWN previous output, so the chains
            # must never diverge at any step — this also exercises the
            # chained-run case (the returned DF lazily reads this run's
            # _dim table; a later run must not drop it mid-chain)
            assert_identical(prod_script, prod_engine)
    finally:
        cleanup_script_tables(spark, "tscript_prop")
