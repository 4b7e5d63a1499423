"""Golden end-to-end test: the reference's worked dim_user example.

Inputs from /root/reference/README.md:55-57 (production) and :85-88
(staging); expected 5-row final state from README.md:306-320, compared
order-insensitively with a frozen ``as_of`` (the two tutorial docs
disagree on tie order, so positions and exact surrogate-key assignment
for tied timestamps are checked as sets — SURVEY.md §5).
"""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge

EOT = datetime(9999, 12, 31, 23, 59, 59)
T0 = datetime(2024, 4, 1, 0, 0, 0)
AS_OF = datetime(2024, 5, 1, 12, 0, 0)

CFG = SCDConfig(
    key="login",
    type2_cols=("premium_user", "address", "phone"),
    type1_cols=("name", "surname", "year_of_birth"),
    surrogate_col="dim_user_id",
)

PROD_SCHEMA = T.StructType(
    [
        T.StructField("dim_user_id", T.IntegerType()),
        T.StructField("login", T.StringType(), False),
        T.StructField("premium_user", T.BooleanType()),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("surname", T.StringType()),
        T.StructField("year_of_birth", T.IntegerType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)

STG_SCHEMA = T.StructType(
    [
        T.StructField("login", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("surname", T.StringType()),
        T.StructField("year_of_birth", T.IntegerType()),
        T.StructField("premium_user", T.BooleanType()),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)


@pytest.fixture()
def golden(spark):
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


def rows_by(df, *cols):
    return {tuple(r[c] for c in cols): r.asDict() for r in df.collect()}


def test_golden_final_state(spark, golden):
    prod, staging = golden
    # explicit parity opt-in (r14: the engine default flipped to the
    # scale-safe "hash"): this test pins the reference's dense 1..5
    # ROW_NUMBER keys, so it asks for them
    out = scd2_merge(prod, staging, CFG, AS_OF, key_strategy="row_number")
    got = rows_by(out, "login", "scd_version")
    assert len(got) == 5

    u1v1 = got[("user1", 1)]
    assert u1v1["scd_active"] is False and u1v1["scd_end_date"] == AS_OF
    assert u1v1["year_of_birth"] == 1985  # Type-1 rewrite applied to closed row
    assert u1v1["phone"] == "123456789"  # Type-2 value preserved on old version

    u1v2 = got[("user1", 2)]
    assert u1v2["scd_active"] is True and u1v2["phone"] == "987654321"
    assert u1v2["scd_start_date"] == AS_OF and u1v2["scd_end_date"] == EOT

    u2v1 = got[("user2", 1)]
    assert u2v1["scd_active"] is False and u2v1["premium_user"] is False

    u2v2 = got[("user2", 2)]
    assert u2v2["premium_user"] is True and u2v2["phone"] is None

    u3 = got[("user3", 1)]
    assert u3["scd_active"] is True and u3["scd_version"] == 1
    assert u3["name"] == "Emma" and u3["address"] == "address3"

    # surrogate keys: permutation of 1..5; the two carried-history rows
    # (start=T0) rank before the three as_of rows
    keys = sorted(r["dim_user_id"] for r in got.values())
    assert keys == [1, 2, 3, 4, 5]
    old = {got[("user1", 1)]["dim_user_id"], got[("user2", 1)]["dim_user_id"]}
    assert old == {1, 2}


def test_no_change_is_idempotent_modulo_type1(spark, golden):
    """Replaying a staging batch equal to current active state changes
    nothing (property §5.3(e))."""
    prod, staging = golden
    once = scd2_merge(prod, staging, CFG, AS_OF, key_strategy="row_number")
    active = once.where("scd_active").select(*STG_SCHEMA.fieldNames())
    twice = scd2_merge(once, active, CFG, datetime(2024, 6, 1),
                       key_strategy="row_number")
    assert twice.count() == once.count()
    assert twice.where("scd_active").count() == once.where("scd_active").count()
    # versions unchanged
    a = sorted((r["login"], r["scd_version"]) for r in twice.collect())
    b = sorted((r["login"], r["scd_version"]) for r in once.collect())
    assert a == b


def test_absent_key_carried_verbatim(spark, golden):
    prod, _ = golden
    empty = spark.createDataFrame([], STG_SCHEMA)
    out = scd2_merge(prod, empty, CFG, AS_OF, key_strategy="row_number")
    got = rows_by(out, "login", "scd_version")
    assert len(got) == 2
    assert all(r["scd_active"] for r in got.values())


import pytest  # noqa: E402  (used by the parametrized edge test below)


@pytest.mark.parametrize("plan", ["full_outer", "broadcast"])
def test_all_inactive_key_not_resurrected(spark, plan):
    """Edge case (SURVEY §7): a staging key whose production rows are all
    inactive gets Type-1 rewrites but no new active row — faithful to the
    reference, where step 7 anti-joins all of production. Must hold on
    BOTH physical plans (the property suite cannot reach this state:
    merges from empty production always leave one active row per key)."""
    prod = spark.createDataFrame(
        [(1, "ghost", False, "a1", None, "Old", "Name", 1970, 1,
          T0, datetime(2024, 4, 15), False)],
        PROD_SCHEMA,
    )
    staging = spark.createDataFrame(
        [("ghost", "New", "Name", 1971, False, "a1", None)], STG_SCHEMA
    )
    out = scd2_merge(prod, staging, CFG, AS_OF, plan=plan,
                     key_strategy="row_number")
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["scd_active"] is False
    assert r["name"] == "New" and r["year_of_birth"] == 1971  # Type-1 applied
    assert r["scd_end_date"] == datetime(2024, 4, 15)  # close-out untouched


def test_stable_strategies_reject_narrow_surrogate(spark, golden):
    """r14 default flip: the stable strategies generate 64-bit keys, so
    an INT surrogate column (the tutorial's own schema) must fail fast
    at plan time with the actionable error — not CAST_OVERFLOW deep in
    the merge job."""
    prod, staging = golden
    for strat in ("hash", "md5"):
        with pytest.raises(ValueError, match="too narrow"):
            scd2_merge(prod, staging, CFG, AS_OF, key_strategy=strat)
