"""Stream-vs-batch parity for the CDC operation stream: driving
cdc_stream over a directory of per-batch files (availableNow,
maxFilesPerTrigger=1) must land the dimension in exactly the state of
applying cdc_apply per batch in sequence — including a delete in one
micro-batch and the same key's resurrection in the next, the case
where batch boundaries matter most."""

from datetime import datetime

import pytest

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.cdc import cdc_apply
from implementing_scds_in_hive_spark.operators.scd import SCDConfig
from implementing_scds_in_hive_spark.streaming.scd_stream import cdc_stream

T0 = datetime(2024, 1, 1)
EOT = datetime(2260, 12, 31, 23, 59, 59)

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

PROD_ROWS = [
    (1, 1, "ann", "A", 1, T0, EOT, True),
    (2, 2, "bob", "B", 1, T0, EOT, True),
    (3, 3, "cat", "C", 1, T0, EOT, True),
]

# batch 0: delete k=1, type-2 change on k=2;
# batch 1: resurrect k=1 (must land at version 2), new key k=9
BATCHES = [
    [(1, None, None, "D", 1), (2, "bob", "B2", "U", 2)],
    [(1, "ann2", "A2", "I", 3), (9, "eve", "E", "I", 4)],
]
AS_OF = {0: datetime(2024, 2, 1), 1: datetime(2024, 3, 1)}


def _snapshot(df):
    return sorted(
        (r["k"], r["scd_version"], r["name"], r["seg"], r["scd_start_date"],
         r["scd_end_date"], r["scd_active"])
        for r in df.collect()
    )


def test_cdc_stream_matches_sequential_batch_applies(spark, tmp_path):
    prod_path = str(tmp_path / "dim")
    spark.createDataFrame(PROD_ROWS, PROD_SCHEMA).write.parquet(prod_path)

    feed_dir = str(tmp_path / "cdc_stream")
    for chunk in BATCHES:
        spark.createDataFrame(chunk, FEED_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(feed_dir)

    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    q = cdc_stream(
        stream,
        prod_path,
        CFG,
        checkpoint_dir=str(tmp_path / "ckpt_cdc"),
        as_of_fn=lambda b: AS_OF[b],
    )
    q.awaitTermination(120)
    assert not q.isActive

    streamed = _snapshot(read_table(spark, prod_path))

    batch = spark.createDataFrame(PROD_ROWS, PROD_SCHEMA)
    for i, chunk in enumerate(BATCHES):
        feed = spark.createDataFrame(chunk, FEED_SCHEMA)
        batch = cdc_apply(batch, feed, CFG, AS_OF[i])
    assert streamed == _snapshot(batch)

    # spot-check the cross-batch delete→resurrect chain
    by_kv = {(r[0], r[1]): r for r in streamed}
    assert by_kv[(1, 1)][6] is False  # closed by batch 0's delete
    assert by_kv[(1, 1)][5] == AS_OF[0]
    assert by_kv[(1, 2)][6] is True  # resurrected by batch 1
    assert by_kv[(1, 2)][4] == AS_OF[1]
    assert by_kv[(9, 1)][6] is True


# ---------------------------------------------------------------------------
# Crash-recovery hypothesis chains (VERDICT r4 next-round #5): random
# micro-batch chains with a process-death injected at a random trigger
# boundary — before the batch does any work, or in the at-least-once
# window AFTER the table publish but BEFORE the checkpoint commit (the
# worst case: restart replays the batch against the already-updated
# table). The table-as-state upsert must converge to the sequential
# batch scd2_merge result regardless of where (or how often) it dies.
# ---------------------------------------------------------------------------

import shutil
import tempfile
import time as _time
from datetime import timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.scd import dedupe_staging, scd2_merge
from implementing_scds_in_hive_spark.streaming.scd_stream import scd2_upsert_stream
from implementing_scds_in_hive_spark.sources.snapshot import read_table

UPSERT_CFG = SCDConfig(
    key="k",
    type2_cols=("v",),
    type1_cols=(),
    surrogate_col="dim_id",
    end_of_time="2260-12-31 23:59:59",
)
UPSERT_PROD_SCHEMA = (
    "dim_id long, k string, v string, scd_version int, scd_start_date timestamp, "
    "scd_end_date timestamp, scd_active boolean"
)


class _InjectedCrash(Exception):
    pass


def _upsert_snapshot(df):
    return sorted(
        (r["k"], r["scd_version"], r["v"], r["scd_start_date"], r["scd_end_date"],
         r["scd_active"])
        for r in df.collect()
    )


# a chain: 1-3 batches, each mapping a few keys to a (nullable) value;
# each batch also draws a crash site: None, or (phase) to die at
_batch = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from(["x", "y", "z", None]),
    min_size=1,
    max_size=3,
)
_crash = st.sampled_from([None, "pre_publish", "post_publish"])
_chain = st.lists(st.tuples(_batch, _crash), min_size=1, max_size=3)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(chain=_chain)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_upsert_stream_survives_random_crash_chains(spark, chain):
    work = tempfile.mkdtemp(prefix="scd_crash_chain_")
    try:
        prod_path = f"{work}/dim"
        spark.createDataFrame(
            [(1, "a", "x", 1, T0, EOT, True), (2, "b", "x", 1, T0, EOT, True)],
            UPSERT_PROD_SCHEMA,
        ).write.parquet(prod_path)

        stg_dir = f"{work}/stg"
        for batch, _ in chain:
            spark.createDataFrame(
                list(batch.items()), "k string, v string"
            ).coalesce(1).write.mode("append").parquet(stg_dir)
            _time.sleep(0.05)  # file-source orders by mtime: keep batches distinct

        as_of_fn = lambda b: T0 + timedelta(days=30 * (b + 1))
        crash_plan = {i: c for i, (_, c) in enumerate(chain) if c}
        fired: set[int] = set()

        def hook(batch_id: int, phase: str) -> None:
            # each planned crash fires ONCE — the replay after restart
            # must run clean, like a real transient death
            if crash_plan.get(batch_id) == phase and batch_id not in fired:
                fired.add(batch_id)
                raise _InjectedCrash(f"batch {batch_id} died {phase}")

        def run_once() -> bool:
            stream = (
                spark.readStream.schema("k string, v string")
                .option("maxFilesPerTrigger", "1")
                .parquet(stg_dir)
            )
            q = scd2_upsert_stream(
                stream,
                prod_path,
                UPSERT_CFG,
                checkpoint_dir=f"{work}/ckpt",
                as_of_fn=as_of_fn,
                crash_hook=hook,
            )
            try:
                q.awaitTermination(120)
                return True
            except Exception:
                q.stop()
                return False

        attempts = 0
        while not run_once():
            attempts += 1
            assert attempts <= len(crash_plan) + 1, "stream failed more than injected"
        assert fired == set(crash_plan), "every planned crash must have fired"

        # ground truth: the same batches applied sequentially, once each
        expected = spark.createDataFrame(
            [(1, "a", "x", 1, T0, EOT, True), (2, "b", "x", 1, T0, EOT, True)],
            UPSERT_PROD_SCHEMA,
        )
        for i, (batch, _) in enumerate(chain):
            stg = spark.createDataFrame(list(batch.items()), "k string, v string")
            expected = scd2_merge(
                expected, dedupe_staging(stg, UPSERT_CFG), UPSERT_CFG, as_of_fn(i)
            )

        assert _upsert_snapshot(read_table(spark, prod_path)) == _upsert_snapshot(expected)
    finally:
        shutil.rmtree(work, ignore_errors=True)
