"""Property-based invariant tests for the SCD2 merge (SURVEY §5.3).

Random sequences of staging batches are applied to an initially-empty
dimension; after every merge the structural invariants must hold:

(a) exactly one active row per business key ever staged
(b) per key: versions are 1,2,3,...; [start, end) intervals chain
    without overlap (each version's end == next version's start)
(c) active rows carry the sentinel end date
(d) surrogate keys are a permutation of 1..n (dense strategies)
(e) replaying the identical batch is a no-op (idempotence)
(f) no row loss: every (key, version) present before a merge survives it,
    with its Type-2 values intact — catches the reference's null-wart
    class of bug (SCD_script.txt:78-80), which this suite exercises by
    staging NULLs in Type-2 columns
(g) plan equivalence: the full_outer and broadcast physical plans
    produce identical tables, and all three key strategies agree on
    everything but the key values themselves
"""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    assign_surrogate_keys,
    scd2_merge,
)

CFG = SCDConfig(
    key="login",
    type2_cols=("address", "phone"),
    type1_cols=("name",),
    surrogate_col="dim_id",
)

PROD_SCHEMA = T.StructType(
    [
        T.StructField("dim_id", T.LongType()),
        T.StructField("login", T.StringType(), False),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)
STG_SCHEMA = T.StructType(
    [
        T.StructField("login", T.StringType(), False),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

KEYS = [f"u{i}" for i in range(6)]
# tiny value pools force collisions (no-change batches) and None exercises
# the null-safe Type-2 predicate
VALS = st.sampled_from(["x", "y", None])
ROW = st.tuples(st.sampled_from(KEYS), VALS, VALS, st.sampled_from(["n1", "n2"]))
BATCH = st.lists(ROW, min_size=0, max_size=6, unique_by=lambda r: r[0])
BATCHES = st.lists(BATCH, min_size=1, max_size=3)

T0 = datetime(2024, 1, 1)
EOT = datetime(9999, 12, 31, 23, 59, 59)


def _apply(spark, batches, plan="full_outer", key_strategy="row_number"):
    prod = spark.createDataFrame([], PROD_SCHEMA)
    for i, batch in enumerate(batches):
        stg = spark.createDataFrame(batch, STG_SCHEMA)
        prod = scd2_merge(
            prod, stg, CFG, T0 + timedelta(days=i), plan=plan, key_strategy=key_strategy
        )
        # materialize: each merge's plan otherwise nests into the next
        prod = spark.createDataFrame(prod.collect(), PROD_SCHEMA)
    return prod


def _by_key(rows):
    d = {}
    for r in rows:
        d.setdefault(r["login"], []).append(r)
    for v in d.values():
        v.sort(key=lambda r: r["scd_version"])
    return d


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_structural_invariants(spark, batches):
    rows = [r.asDict() for r in _apply(spark, batches).collect()]
    staged_keys = {r[0] for b in batches for r in b}
    per_key = _by_key(rows)
    assert set(per_key) == staged_keys

    for key, versions in per_key.items():
        # (a) exactly one active
        assert sum(1 for r in versions if r["scd_active"]) == 1
        # (b) versions consecutive from 1; intervals chain
        assert [r["scd_version"] for r in versions] == list(range(1, len(versions) + 1))
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["scd_end_date"] == nxt["scd_start_date"]
            assert not prev["scd_active"]
        # (c) the active (last) row carries the sentinel
        assert versions[-1]["scd_active"] and versions[-1]["scd_end_date"] == EOT
    # (d) dense surrogate keys
    assert sorted(r["dim_id"] for r in rows) == list(range(1, len(rows) + 1))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_idempotent_replay_and_no_row_loss(spark, batches):
    prod = _apply(spark, batches)
    before = {(r["login"], r["scd_version"]): r.asDict() for r in prod.collect()}

    # (e) replay the last batch at a later as_of: no new versions
    last = spark.createDataFrame(batches[-1], STG_SCHEMA)
    replayed = scd2_merge(prod, last, CFG, T0 + timedelta(days=99))
    after = {(r["login"], r["scd_version"]): r.asDict() for r in replayed.collect()}
    assert set(after) == set(before)

    # (f) Type-2 values and interval bounds survived, even with NULLs
    for k, b in before.items():
        a = after[k]
        for c in ("address", "phone", "scd_start_date", "scd_end_date", "scd_active"):
            assert a[c] == b[c], (k, c)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_plan_and_key_strategy_equivalence(spark, batches):
    def snapshot(df, with_keys=True):
        cols = ("login", "scd_version", "address", "phone", "name",
                "scd_start_date", "scd_end_date", "scd_active")
        rows = df.collect()
        data = sorted(tuple(r[c] for c in cols) for r in rows)
        keys = sorted(r["dim_id"] for r in rows) if with_keys else None
        return data, keys

    # (g) physical plans agree exactly
    fo = snapshot(_apply(spark, batches, plan="full_outer"))
    bc = snapshot(_apply(spark, batches, plan="broadcast"))
    assert fo == bc

    # key strategies agree on data; two_pass is dense like row_number,
    # hash keys are merely unique
    tp_data, tp_keys = snapshot(_apply(spark, batches, key_strategy="two_pass"))
    assert tp_data == fo[0] and tp_keys == fo[1]
    h_data, h_keys = snapshot(_apply(spark, batches, key_strategy="hash"))
    assert h_data == fo[0] and len(set(h_keys)) == len(h_keys)


def test_hash_keys_stable_across_runs(spark):
    """hash strategy: same row → same key (stability is the property that
    lets downstream fact tables keep referencing dimension keys)."""
    rows = [
        (None, "u1", "a", None, "n", 1, T0, EOT, True),
        (None, "u2", "b", "p", "n", 1, T0, EOT, True),
    ]
    df = spark.createDataFrame(rows, PROD_SCHEMA)
    k1 = sorted(r["dim_id"] for r in assign_surrogate_keys(df, CFG, strategy="hash").collect())
    k2 = sorted(r["dim_id"] for r in assign_surrogate_keys(df, CFG, strategy="hash").collect())
    assert k1 == k2 and len(set(k1)) == 2


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 6),                 # key (forces duplicates)
            st.one_of(st.none(), st.text("ab", max_size=3)),  # value
            st.integers(0, 1_000_000),         # seq (unique-ified below)
        ),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_dedupe_strategy_equivalence(spark, rows):
    """r12 (VERDICT r11 #5): the skew-immune max_by dedupe must pick
    row-identical winners to the row_number window whenever order_by is
    a total order — seqs are unique-ified so ties (arbitrary winner in
    BOTH formulations) cannot flake the compare."""
    from implementing_scds_in_hive_spark.operators.scd import dedupe_staging

    cfg = SCDConfig(
        key="login",
        type2_cols=("address",),
        type1_cols=(),
        surrogate_col="dim_id",
    )
    data = [
        (f"k{k}", v, i * 2_000_000 + seq)  # i-offset makes seq unique
        for i, (k, v, seq) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "login string, address string, seq long"
    )
    a = sorted(
        map(tuple, dedupe_staging(df, cfg, order_by=["seq"]).collect())
    )
    b = sorted(
        map(
            tuple,
            dedupe_staging(
                df, cfg, order_by=["seq"], strategy="max_by"
            ).collect(),
        )
    )
    assert a == b
