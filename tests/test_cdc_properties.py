"""Property-based invariants for cdc_apply over random operation-feed
sequences applied to an initially empty dimension (the CDC analog of
test_scd_properties):

(a) per key: exactly one active row if the key's last effective
    operation was an upsert, zero if it was a delete (and no rows at
    all for keys only ever deleted)
(b) versions are 1,2,3,... dense; [start, end) intervals are ordered
    and non-overlapping — chained within a life segment, gapped across
    a delete→resurrect boundary
(c) the final active row carries the last upsert's values (a mirror
    model computed in plain Python from the batch-collapse rule)
(d) dense surrogate keys under the row_number strategy
"""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.cdc import cdc_apply
from implementing_scds_in_hive_spark.operators.scd import SCDConfig

CFG = SCDConfig(
    key="k",
    type2_cols=("seg",),
    type1_cols=("name",),
    surrogate_col="dim_id",
    end_of_time="2260-12-31 23:59:59",
)

PROD_SCHEMA = T.StructType(
    [
        T.StructField("dim_id", T.LongType()),
        T.StructField("k", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)
FEED_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("op", T.StringType(), False),
        T.StructField("op_seq", T.IntegerType(), False),
    ]
)

KEYS = ["a", "b", "c"]
EVENT = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["n1", "n2"]),
    st.sampled_from(["x", "y", None]),
    st.sampled_from(["I", "U", "D"]),
)
BATCH = st.lists(EVENT, min_size=1, max_size=6)
BATCHES = st.lists(BATCH, min_size=1, max_size=3)

T0 = datetime(2024, 1, 1)


def _model(batches):
    """Python mirror: per key, the last event of each batch wins; a
    final upsert sets the values, a final delete clears active. Returns
    (state, ever_alive): only keys that were ever upserted have rows."""
    state = {}  # key -> ("alive", name, seg) | ("dead",)
    ever_alive = set()
    for batch in batches:
        final = {}
        for key, name, seg, op in batch:
            final[key] = (key, name, seg, op)
        for key, (k, name, seg, op) in final.items():
            if op == "D":
                if key in state:
                    state[key] = ("dead",)
            else:
                state[key] = ("alive", name, seg)
                ever_alive.add(key)
    return state, ever_alive


def _apply(spark, batches):
    prod = spark.createDataFrame([], PROD_SCHEMA)
    for i, batch in enumerate(batches):
        rows = [
            (key, None if op == "D" else name, None if op == "D" else seg, op, seq)
            for seq, (key, name, seg, op) in enumerate(batch)
        ]
        feed = spark.createDataFrame(rows, FEED_SCHEMA)
        prod = cdc_apply(
            prod, feed, CFG, T0 + timedelta(days=i), key_strategy="row_number"
        )
        prod = spark.createDataFrame(prod.collect(), PROD_SCHEMA)
    return prod


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_cdc_structural_invariants(spark, batches):
    rows = [r.asDict() for r in _apply(spark, batches).collect()]
    model, ever_alive = _model(batches)

    per_key = {}
    for r in rows:
        per_key.setdefault(r["k"], []).append(r)
    for v in per_key.values():
        v.sort(key=lambda r: r["scd_version"])

    # keys present in the table = keys that were ever upserted
    # (delete-only keys leave no trace)
    assert set(per_key) == ever_alive

    for key, versions in per_key.items():
        state = model[key]
        n_active = sum(1 for r in versions if r["scd_active"])
        # (a) active count matches the model
        assert n_active == (1 if state[0] == "alive" else 0)
        # (b) dense versions, ordered non-overlapping intervals
        assert [r["scd_version"] for r in versions] == list(range(1, len(versions) + 1))
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["scd_end_date"] <= nxt["scd_start_date"]
            assert not prev["scd_active"]
        # (c) final active values match the last upsert
        if state[0] == "alive":
            last = versions[-1]
            assert last["scd_active"]
            assert (last["name"], last["seg"]) == (state[1], state[2])

    # (d) dense surrogate keys
    assert sorted(r["dim_id"] for r in rows) == list(range(1, len(rows) + 1))
