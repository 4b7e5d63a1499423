"""Unit semantics of the CDC apply path (operators/cdc.py) on
hand-built micro-dimensions: within-batch collapse order, delete
close-out, resurrection version numbering, no-op deletes, and payload
handling on delete rows. The sf-scale value equivalence against DuckDB
runs in test_pytest_only_oracles (scd_cdc_collapse / scd_cdc_apply)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.cdc import cdc_apply, collapse_cdc
from implementing_scds_in_hive_spark.operators.scd import SCDConfig

EOT = datetime(2260, 12, 31, 23, 59, 59)
T0 = datetime(2024, 1, 1)
AS_OF = datetime(2024, 7, 1)

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
        T.StructField("k", T.LongType(), False),
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
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("seg", T.StringType()),
        T.StructField("op", T.StringType(), False),
        T.StructField("op_seq", T.IntegerType(), False),
    ]
)


@pytest.fixture()
def prod(spark):
    rows = [
        # k=1: active, will be deleted
        (1, 1, "ann", "A", 1, T0, EOT, True),
        # k=2: active v2 + closed v1, will be updated (type-2 change)
        (2, 2, "bob", "B", 2, T0, EOT, True),
        (3, 2, "bob", "B0", 1, datetime(2023, 1, 1), T0, False),
        # k=3: fully inactive (previously deleted) at v3 -> resurrection
        (4, 3, "cat", "C", 3, datetime(2023, 6, 1), datetime(2024, 2, 1), False),
        # k=4: active, untouched by the feed
        (5, 4, "dan", "D", 1, T0, EOT, True),
    ]
    return spark.createDataFrame(rows, PROD_SCHEMA)


def apply(spark, prod, feed_rows, **kw):
    feed = spark.createDataFrame(feed_rows, FEED_SCHEMA)
    out = cdc_apply(prod, feed, CFG, AS_OF, key_strategy="row_number", **kw)
    return {(r["k"], r["scd_version"]): r for r in out.collect()}, out


def test_collapse_is_last_wins_per_key(spark):
    feed = spark.createDataFrame(
        [(1, "x", "S1", "I", 1), (1, "y", "S2", "U", 3), (1, "z", "S3", "U", 2)],
        FEED_SCHEMA,
    )
    rows = collapse_cdc(feed, CFG).collect()
    assert len(rows) == 1
    assert (rows[0]["name"], rows[0]["seg"], rows[0]["op"]) == ("y", "S2", "U")


def test_delete_closes_active_and_keeps_history(spark, prod):
    by_kv, out = apply(spark, prod, [(1, None, None, "D", 1)])
    closed = by_kv[(1, 1)]
    assert closed["scd_active"] is False
    assert closed["scd_end_date"] == AS_OF
    # values untouched by the (payload-free) delete
    assert (closed["name"], closed["seg"]) == ("ann", "A")
    # everything else carried: same row count, k=4 still active
    assert out.count() == prod.count()
    assert by_kv[(4, 1)]["scd_active"] is True


def test_delete_of_unknown_or_inactive_key_is_noop(spark, prod):
    by_kv, out = apply(
        spark, prod, [(99, None, None, "D", 1), (3, None, None, "D", 1)]
    )
    assert out.count() == prod.count()
    ghost = by_kv[(3, 3)]
    assert ghost["scd_active"] is False
    assert ghost["scd_end_date"] == datetime(2024, 2, 1)  # original close-out


def test_upsert_change_closes_and_versions(spark, prod):
    by_kv, out = apply(spark, prod, [(2, "bobby", "B9", "U", 1)])
    assert by_kv[(2, 2)]["scd_active"] is False
    assert by_kv[(2, 2)]["scd_end_date"] == AS_OF
    assert by_kv[(2, 2)]["name"] == "bobby"  # Type-1 rewrite on close-out
    assert by_kv[(2, 1)]["name"] == "bobby"  # ... and on history
    new = by_kv[(2, 3)]
    assert (new["seg"], new["scd_active"], new["scd_start_date"]) == ("B9", True, AS_OF)


def test_resurrection_gets_max_plus_one(spark, prod):
    by_kv, out = apply(spark, prod, [(3, "cat2", "C", "I", 1)])
    reborn = by_kv[(3, 4)]  # max historical version 3 -> 4
    assert (reborn["scd_active"], reborn["scd_start_date"]) == (True, AS_OF)
    assert by_kv[(3, 3)]["name"] == "cat2"  # Type-1 rewrite reaches history
    assert by_kv[(3, 3)]["scd_active"] is False


def test_within_batch_insert_then_delete_nets_to_delete(spark, prod):
    by_kv, out = apply(
        spark, prod, [(1, "annX", "Z", "U", 1), (1, None, None, "D", 2)]
    )
    closed = by_kv[(1, 1)]
    assert closed["scd_active"] is False
    # the intermediate U's values must NOT land
    assert (closed["name"], closed["seg"]) == ("ann", "A")
    assert out.count() == prod.count()


def test_within_batch_delete_then_insert_nets_to_upsert(spark, prod):
    by_kv, out = apply(
        spark, prod, [(2, None, None, "D", 1), (2, "bob", "B2", "I", 2)]
    )
    assert by_kv[(2, 2)]["scd_active"] is False  # closed by the change
    assert by_kv[(2, 3)]["seg"] == "B2"
    assert by_kv[(2, 3)]["scd_active"] is True


def test_brand_new_key_is_version_one(spark, prod):
    by_kv, out = apply(spark, prod, [(7, "eve", "E", "I", 1)])
    assert by_kv[(7, 1)]["scd_active"] is True
    assert by_kv[(7, 1)]["scd_start_date"] == AS_OF


def test_unchanged_upsert_rewrites_type1_only(spark, prod):
    by_kv, out = apply(spark, prod, [(2, "robert", "B", "U", 1)])
    assert out.count() == prod.count()  # no new version
    assert by_kv[(2, 2)]["name"] == "robert"
    assert by_kv[(2, 2)]["scd_active"] is True
    assert by_kv[(2, 1)]["name"] == "robert"


def test_snapshot_to_cdc_emits_only_changes(spark):
    from implementing_scds_in_hive_spark.operators.cdc import snapshot_to_cdc

    old = spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B"), (3, "cat", "C")],
        "k long, name string, seg string",
    )
    new = spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B2"), (4, "dan", "D")],
        "k long, name string, seg string",
    )
    feed = {r["k"]: r for r in snapshot_to_cdc(old, new, CFG).collect()}
    assert set(feed) == {2, 3, 4}  # k=1 identical -> absent
    assert feed[2]["op"] == "U" and feed[2]["seg"] == "B2"
    assert feed[3]["op"] == "D" and feed[3]["name"] is None  # payload nulls
    assert feed[4]["op"] == "I" and feed[4]["name"] == "dan"


def test_snapshot_diff_roundtrip_reaches_new_snapshot(spark, prod):
    """THE contract: cdc_apply(dim, snapshot_to_cdc(old, new)) must make
    the dimension's active rows exactly the new snapshot — including
    closing out keys that vanished, which the snapshot merge cannot
    express."""
    from implementing_scds_in_hive_spark.operators.cdc import (
        cdc_apply,
        snapshot_to_cdc,
    )

    old = prod.where("scd_active").select("k", "name", "seg")
    new = spark.createDataFrame(
        [(1, "ann", "A9"), (2, "bob2", "B"), (7, "eve", "E")],  # k=4 vanished
        "k long, name string, seg string",
    )
    feed = snapshot_to_cdc(old, new, CFG)
    out = cdc_apply(prod, feed, CFG, AS_OF, key_strategy="row_number")
    active = sorted(
        (r["k"], r["name"], r["seg"]) for r in out.where("scd_active").collect()
    )
    assert active == sorted(tuple(r) for r in new.collect())


def test_cdc_apply_plan_all_joins_broadcast(spark, prod):
    """Scale guard: with key_strategy='hash' the dimension-side branch
    pass is shuffle-free — every join broadcasts, no sort-merge join,
    no single-partition exchange; the only hash exchange aggregates the
    feed-key-pruned stats rows."""
    from implementing_scds_in_hive_spark.operators.cdc import cdc_apply

    feed = spark.createDataFrame(
        [(2, "bobby", "B9", "U", 1), (7, "eve", "E", "I", 2)], FEED_SCHEMA
    )
    out = cdc_apply(prod, feed, CFG, AS_OF, key_strategy="hash")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_cdc_apply_is_idempotent_per_batch(spark, prod):
    """Reapplying the same collapsed batch must be a no-op: the upsert
    finds values unchanged (Type-1 rewrite only), the delete finds the
    key already closed. Restart-safety for the foreachBatch stream."""
    from implementing_scds_in_hive_spark.operators.cdc import cdc_apply

    feed_rows = [
        (1, None, None, "D", 1),
        (2, "bobby", "B9", "U", 2),
        (7, "eve", "E", "I", 3),
    ]
    feed = spark.createDataFrame(feed_rows, FEED_SCHEMA)
    once = cdc_apply(prod, feed, CFG, AS_OF, key_strategy="row_number")
    twice = cdc_apply(once, feed, CFG, AS_OF, key_strategy="row_number")
    snap = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert snap(once) == snap(twice)


def test_surrogate_keys_are_dense_and_unique(spark, prod):
    _, out = apply(
        spark, prod, [(2, "bobby", "B9", "U", 1), (7, "eve", "E", "I", 2)]
    )
    ids = sorted(r["dim_id"] for r in out.collect())
    assert ids == list(range(1, len(ids) + 1))


def test_snapshot_to_cdc_rejects_empty_compare_cols(spark):
    from implementing_scds_in_hive_spark.operators.cdc import snapshot_to_cdc

    old = spark.createDataFrame([(1, "a", "A")], "k long, name string, seg string")
    with pytest.raises(ValueError, match="compare_cols must be non-empty"):
        snapshot_to_cdc(old, old, CFG, compare_cols=())


def test_cache_handles_collect_and_release_persisted_intermediates(spark, prod):
    """Batch callers applying many feeds need a release hook for the
    internally-persisted collapsed feed + two_pass re-key intermediates
    (ADVICE r2): cache_handles must surface every persisted DataFrame,
    and unpersisting them must leave the session cache empty."""
    from implementing_scds_in_hive_spark.operators.cdc import cdc_apply

    feed = spark.createDataFrame(
        [(2, "bobby", "B9", "U", 1), (7, "eve", "E", "I", 2)], FEED_SCHEMA
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    handles: list = []
    out = cdc_apply(prod, feed, CFG, AS_OF, key_strategy="two_pass",
                    cache_handles=handles)
    out.collect()
    # collapsed feed + two_pass (src, local)
    assert len(handles) == 3
    assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
    assert jsc.getPersistentRDDs().size() > before
    for h in handles:
        h.unpersist(blocking=True)
    # back to the pre-call cache footprint (the session is shared with
    # other tests, so compare against the snapshot, not zero)
    assert jsc.getPersistentRDDs().size() == before
