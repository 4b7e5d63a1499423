"""Streaming tests: each streaming operator is checked against its batch
twin over the same data — the stream (driven with availableNow triggers
over a directory of parquet files) must converge to exactly the state a
single batch run produces.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge
from implementing_scds_in_hive_spark.streaming.scd_stream import scd2_upsert_stream
from implementing_scds_in_hive_spark.streaming.stateful import running_user_profiles
from implementing_scds_in_hive_spark.streaming.windows import (
    deduped_stream,
    read_events_stream,
    session_windows,
    windowed_rollup,
)

from implementing_scds_in_hive_spark.sources.snapshot import read_table


T0 = datetime(2024, 1, 1)


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


EVENT_FIELDS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _event_rows(n=200, users=7):
    return [
        (
            i,
            T0 + timedelta(minutes=7 * i),
            i % users,
            ["view", "click", "buy"][i % 3],
            float(i % 50) / 2,
            "{}",
        )
        for i in range(n)
    ]


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Three parquet files in one directory → three micro-batches with
    maxFilesPerTrigger=1."""
    rows = _event_rows()
    path = str(tmp_path / "events_stream")
    for i, chunk in enumerate([rows[0:70], rows[70:140], rows[140:200]]):
        spark.createDataFrame(chunk, EVENT_FIELDS).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return path


def test_windowed_rollup_stream_matches_batch(spark, tmp_path, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = windowed_rollup(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from rollup_sink").collect()
    }
    batch = windowed_rollup(read_table(spark, events_dir))
    want = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 5


def test_sliding_windows_overlap(spark):
    """slide < window: each event lands in window/slide buckets."""
    rows = [(1, T0 + timedelta(minutes=10), 1, "view", 1.0, "{}")]
    events = spark.createDataFrame(rows, EVENT_FIELDS)
    out = windowed_rollup(events, window="1 hour", slide="30 minutes")
    starts = sorted(r["bucket_start"] for r in out.collect())
    # the 00:10 event belongs to windows starting 23:30 and 00:00
    assert starts == [T0 - timedelta(minutes=30), T0]
    assert all(r["n_events"] == 1 for r in out.collect())


def test_scd2_upsert_stream_converges_to_batch_merges(spark, tmp_path):
    cfg = SCDConfig(
        key="login",
        type2_cols=("address",),
        type1_cols=("name",),
        surrogate_col="dim_id",
    )
    prod_schema = T.StructType(
        [
            T.StructField("dim_id", T.LongType()),
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("scd_version", T.IntegerType()),
            T.StructField("scd_start_date", T.TimestampType()),
            T.StructField("scd_end_date", T.TimestampType()),
            T.StructField("scd_active", T.BooleanType()),
        ]
    )
    eot = datetime(9999, 12, 31, 23, 59, 59)
    prod_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "u1", "a1", "N1", 1, T0, eot, True), (2, "u2", "a2", "N2", 1, T0, eot, True)],
        prod_schema,
    ).write.parquet(prod_path)

    stg_schema = T.StructType(
        [
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("batch_ts", T.TimestampType()),
        ]
    )
    # batch 0: u1 changes address (type2) + u3 new; batch 1: u2 renamed
    # (type1 only) + u1 changes address again
    batches = [
        [("u1", "a1-new", "N1", T0), ("u3", "a3", "N3", T0)],
        [("u2", "a2", "N2-renamed", T0), ("u1", "a1-newer", "N1", T0)],
    ]
    stg_dir = str(tmp_path / "staging_stream")
    for chunk in batches:
        spark.createDataFrame(chunk, stg_schema).coalesce(1).write.mode("append").parquet(stg_dir)

    as_of = {0: datetime(2024, 2, 1), 1: datetime(2024, 3, 1)}
    stream = (
        spark.readStream.schema(stg_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stg_dir)
    )
    q = scd2_upsert_stream(
        stream,
        prod_path,
        cfg,
        checkpoint_dir=str(tmp_path / "ckpt_scd"),
        order_by=["batch_ts"],
        as_of_fn=lambda b: as_of[b],
    )
    _await(q)

    # File order within a directory listing is lexicographic by file name,
    # but two appends may interleave; accept either batch order by
    # comparing against the batch-mode merge applied in both orders.
    def batch_apply(order):
        prod = spark.createDataFrame(
            [(1, "u1", "a1", "N1", 1, T0, eot, True), (2, "u2", "a2", "N2", 1, T0, eot, True)],
            prod_schema,
        )
        for i in order:
            stg = spark.createDataFrame(batches[i], stg_schema).drop("batch_ts")
            prod = scd2_merge(prod, stg, cfg, as_of[i])
        return sorted(
            (r["login"], r["scd_version"], r["address"], r["name"], r["scd_active"])
            for r in prod.collect()
        )

    got = sorted(
        (r["login"], r["scd_version"], r["address"], r["name"], r["scd_active"])
        for r in read_table(spark, prod_path).collect()
    )
    assert got in (batch_apply([0, 1]), batch_apply([1, 0]))
    # u1 must have 3 versions (two type-2 changes), exactly one active
    u1 = [g for g in got if g[0] == "u1"]
    assert len(u1) == 3 and sum(1 for g in u1 if g[4]) == 1


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    """Duplicate event_ids delivered across micro-batches inside the
    watermark horizon are dropped; the sink sees each event once."""
    rows = _event_rows(n=60)
    dupes = rows[10:30]  # re-deliver 20 events in a later batch
    path = str(tmp_path / "dup_stream")
    for chunk in [rows[0:40], dupes + rows[40:60]]:
        spark.createDataFrame(chunk, EVENT_FIELDS).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    stream = read_events_stream(spark, path, max_files_per_trigger=1)
    q = (
        deduped_stream(stream, watermark="24 hours")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = [r["event_id"] for r in spark.sql("select event_id from dedup_sink").collect()]
    assert sorted(got) == list(range(60))  # every event exactly once


def test_session_windows_gap_semantics(spark):
    """Batch-mode check of the gap-based session_window plan (the same
    DataFrame code runs on a stream with watermark state): bursts closer
    than the gap merge; a gap boundary splits."""
    rows = [
        # user 1: burst of 3 events 10 min apart, then a 2h gap, then 1
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + timedelta(minutes=10), 1, "view", 1.0, "{}"),
        (3, T0 + timedelta(minutes=20), 1, "view", 1.0, "{}"),
        (4, T0 + timedelta(hours=3), 1, "view", 1.0, "{}"),
        # user 2: single event
        (5, T0, 2, "buy", 5.0, "{}"),
    ]
    events = spark.createDataFrame(rows, EVENT_FIELDS)
    out = session_windows(events, gap="30 minutes")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in out.collect()
    }
    assert got[(1, T0)] == (3, T0 + timedelta(minutes=50))  # last event + gap
    assert got[(1, T0 + timedelta(hours=3))] == (1, T0 + timedelta(hours=3, minutes=30))
    assert got[(2, T0)] == (1, T0 + timedelta(minutes=30))
    assert len(got) == 3


def test_stateful_running_profiles(spark, tmp_path, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = running_user_profiles(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profiles_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    # update-mode sink appends one row per (user, micro-batch); the LAST
    # row per user is the final running total → must equal batch agg
    sink = spark.sql("select * from profiles_sink")
    final = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in sink.orderBy("n_events").collect()
    }
    batch = (
        read_table(spark, events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
            F.max("ts").alias("mt"),
        )
    )
    want = {r["user_id"]: (r["n"], float(r["tv"]), r["mt"]) for r in batch.collect()}
    assert set(final) == set(want)
    for uid, (n, tv, mt) in want.items():
        gn, gtv, gmt = final[uid]
        assert gn == n and abs(gtv - tv) < 1e-9 and gmt == mt

def test_stateful_profile_all_null_first_chunk_recovers_last_ts():
    """r11 streaming review: a first chunk whose timestamps are ALL
    null yielded last_ts = NaT, and `real > NaT` is False, so later
    real timestamps in the same batch could never displace it. The
    profile must carry the real timestamp (and an all-null batch must
    leave last_ts null, not NaT-stuck)."""
    import pandas as pd

    from implementing_scds_in_hive_spark.streaming.stateful import (
        _update_user_profile,
    )

    class _State:
        exists = False

        def update(self, v):
            self.stored = v

    chunks = [
        pd.DataFrame({"ts": pd.to_datetime([None, None]), "value": [1.0, 2.0]}),
        pd.DataFrame(
            {"ts": pd.to_datetime(["2026-01-02", "2026-01-01"]), "value": [3.0, None]}
        ),
    ]
    state = _State()
    (out,) = list(_update_user_profile((7,), chunks, state))
    assert out["n_events"].iloc[0] == 4
    assert out["total_value"].iloc[0] == 6.0
    got = out["last_ts"].iloc[0]
    assert got == pd.Timestamp("2026-01-02"), got
    assert state.stored[2] == pd.Timestamp("2026-01-02")

    # all-null across the whole batch: last_ts stays null (None/NaT is
    # acceptable as a null carrier), and a SECOND batch with real ts
    # must still displace it
    class _State2:
        exists = False

        def update(self, v):
            self.stored = v
            self.exists = True

        @property
        def get(self):
            return self.stored

    s2 = _State2()
    list(_update_user_profile((8,), [chunks[0]], s2))
    assert s2.stored[2] is None or pd.isna(s2.stored[2])
    (out2,) = list(_update_user_profile((8,), [chunks[1]], s2))
    assert out2["last_ts"].iloc[0] == pd.Timestamp("2026-01-02")


def test_merge_stream_rejects_nonpositive_retries(spark, tmp_path):
    """max_commit_retries=0 would skip the retry loop BODY: the merge
    never runs yet the checkpoint commits — silent data loss. Reject at
    construction (r11 streaming review)."""
    import pytest

    from implementing_scds_in_hive_spark.streaming.dml_stream import merge_stream

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(src)
    stream = spark.readStream.schema("id long, v string").parquet(src)
    with pytest.raises(ValueError, match="max_commit_retries"):
        merge_stream(
            stream,
            str(tmp_path / "tgt"),
            on=["id"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            stream_id="s1",
            max_commit_retries=0,
        )


def test_scd2_upsert_stream_maxby_dedupe_matches_window(spark, tmp_path):
    """r12: the skew-immune dedupe_strategy='max_by' face of the upsert
    stream produces a byte-identical dimension to the default window
    dedupe on a feed with heavy in-batch redelivery (the CDC shape the
    strategy exists for)."""
    cfg = SCDConfig(
        key="login",
        type2_cols=("address",),
        type1_cols=("name",),
        surrogate_col="dim_id",
    )
    prod_schema = T.StructType(
        [
            T.StructField("dim_id", T.LongType()),
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("scd_version", T.IntegerType()),
            T.StructField("scd_start_date", T.TimestampType()),
            T.StructField("scd_end_date", T.TimestampType()),
            T.StructField("scd_active", T.BooleanType()),
        ]
    )
    eot = datetime(9999, 12, 31, 23, 59, 59)
    seed = [
        (1, "u1", "a1", "N1", 1, T0, eot, True),
        (2, "u2", "a2", "N2", 1, T0, eot, True),
    ]
    stg_schema = T.StructType(
        [
            T.StructField("login", T.StringType(), False),
            T.StructField("address", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    # one hot key (u1) redelivered many times per batch with a total
    # order; the LAST seq per key must win under both strategies
    batches = [
        [("u1", f"a1-v{i}", "N1", i) for i in range(40)] + [("u3", "a3", "N3", 1)],
        [("u1", f"a1-w{i}", "N1", 100 + i) for i in range(40)]
        + [("u2", "a2", "N2-ren", 1)],
    ]
    as_of = {0: datetime(2024, 2, 1), 1: datetime(2024, 3, 1)}

    results = {}
    for strategy in ("row_number", "max_by"):
        prod_path = str(tmp_path / f"dim_{strategy}")
        spark.createDataFrame(seed, prod_schema).write.parquet(prod_path)
        stg_dir = str(tmp_path / f"stg_{strategy}")
        for chunk in batches:
            spark.createDataFrame(chunk, stg_schema).coalesce(1).write.mode(
                "append"
            ).parquet(stg_dir)
        stream = (
            spark.readStream.schema(stg_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stg_dir)
        )
        q = scd2_upsert_stream(
            stream,
            prod_path,
            cfg,
            checkpoint_dir=str(tmp_path / f"ckpt_{strategy}"),
            order_by=["seq"],
            dedupe_strategy=strategy,
            as_of_fn=lambda b: as_of[b],
        )
        _await(q)
        results[strategy] = sorted(
            (r["login"], r["scd_version"], r["address"], r["name"],
             r["scd_active"])
            for r in read_table(spark, prod_path).collect()
        )
    assert results["row_number"] == results["max_by"]
    # the hot key's winners are the LAST redelivery of each batch
    u1 = [g for g in results["max_by"] if g[0] == "u1"]
    assert ("u1", 3, "a1-w39", "N1", True) in u1
