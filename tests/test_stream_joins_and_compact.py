"""Stream-stream interval join (batch-pinned semantics + a real
streaming run), checkpoint-restart idempotence of the SCD upsert
stream, and small-file compaction."""

from datetime import datetime, timedelta

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.sources.sinks import compact
from implementing_scds_in_hive_spark.streaming.joins import interval_join
from implementing_scds_in_hive_spark.sources.snapshot import read_table

T0 = datetime(2024, 1, 1)


def test_interval_join_batch_semantics(spark):
    clicks = spark.createDataFrame(
        [
            (1, "u1", T0 + timedelta(minutes=30)),   # inside window of imp 10
            (2, "u1", T0 + timedelta(minutes=90)),   # outside (imp 10 + 1h)
            (3, "u2", T0 + timedelta(minutes=10)),   # before u2's impression
        ],
        "click_id long, user string, cts timestamp",
    )
    imps = spark.createDataFrame(
        [(10, "u1", T0), (20, "u2", T0 + timedelta(minutes=20))],
        "imp_id long, user string, its timestamp",
    )
    out = interval_join(
        clicks, imps, key="user", left_ts="cts", right_ts="its", max_delay="1 hour"
    )
    got = {(r["click_id"], r["imp_id"]) for r in out.collect()}
    assert got == {(1, 10)}


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    rows_l = [(i, f"u{i % 5}", T0 + timedelta(minutes=3 * i)) for i in range(60)]
    rows_r = [(100 + i, f"u{i % 5}", T0 + timedelta(minutes=3 * i - 7)) for i in range(60)]
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    ls = "click_id long, user string, cts timestamp"
    rs = "imp_id long, user string, its timestamp"
    spark.createDataFrame(rows_l, ls).write.parquet(lp)
    spark.createDataFrame(rows_r, rs).write.parquet(rp)

    batch = interval_join(
        read_table(spark, lp),
        read_table(spark, rp),
        key="user", left_ts="cts", right_ts="its", max_delay="30 minutes",
    )
    want = {(r["click_id"], r["imp_id"]) for r in batch.collect()}
    assert len(want) > 50

    sl = spark.readStream.schema(ls).parquet(lp)
    sr = spark.readStream.schema(rs).parquet(rp)
    q = (
        interval_join(sl, sr, key="user", left_ts="cts", right_ts="its",
                      max_delay="30 minutes")
        .select("click_id", "imp_id")
        .writeStream.format("memory")
        .queryName("sj_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["click_id"], r["imp_id"]) for r in spark.sql("select * from sj_sink").collect()}
    assert got == want


def test_scd_stream_restart_is_idempotent(spark, tmp_path):
    """Restarting the upsert stream with the same checkpoint must not
    re-merge already-processed batches (checkpoint tracks consumed
    files; the dimension is untouched on the second run)."""
    from implementing_scds_in_hive_spark.operators.scd import SCDConfig
    from implementing_scds_in_hive_spark.streaming.scd_stream import scd2_upsert_stream

    cfg = SCDConfig(key="k", type2_cols=("v",), type1_cols=(), surrogate_col="dim_id")
    eot = datetime(9999, 12, 31, 23, 59, 59)
    prod_schema = (
        "dim_id long, k string, v string, scd_version int, scd_start_date timestamp, "
        "scd_end_date timestamp, scd_active boolean"
    )
    prod_path = str(tmp_path / "dim")
    spark.createDataFrame([(1, "a", "v1", 1, T0, eot, True)], prod_schema).write.parquet(
        prod_path
    )
    stg_dir = str(tmp_path / "stg")
    spark.createDataFrame([("a", "v2")], "k string, v string").coalesce(1).write.mode(
        "append"
    ).parquet(stg_dir)

    def run():
        stream = spark.readStream.schema("k string, v string").parquet(stg_dir)
        q = scd2_upsert_stream(
            stream,
            prod_path,
            cfg,
            checkpoint_dir=str(tmp_path / "ckpt"),
            as_of_fn=lambda b: datetime(2024, 2, 1),
        )
        q.awaitTermination(120)

    run()
    first = sorted(
        (r["k"], r["scd_version"], r["v"]) for r in read_table(spark, prod_path).collect()
    )
    assert len(first) == 2  # close-out + new version
    run()  # restart: same checkpoint, no new files
    second = sorted(
        (r["k"], r["scd_version"], r["v"]) for r in read_table(spark, prod_path).collect()
    )
    assert second == first


def test_compact_partitioned_requires_and_preserves_layout(spark, tmp_path):
    import glob

    import pytest

    path = str(tmp_path / "parted_frag")
    df = spark.range(0, 4_000).selectExpr("id", "CAST(id % 2 AS INT) AS part")
    df.repartition(10).write.partitionBy("part").parquet(path)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact(spark, path, target_rows_per_file=2_000)
    n = compact(spark, path, target_rows_per_file=2_000, partition_by=["part"])
    assert n == 4_000
    # layout preserved, files compacted within each partition dir
    for p in ("part=0", "part=1"):
        files = glob.glob(f"{path}/{p}/*.parquet")
        assert 1 <= len(files) <= 2
    assert read_table(spark, path).where("part = 1").count() == 2_000


def test_compact_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS grp")
    df.repartition(40).write.parquet(path)  # fragmented: 40 small files
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 40
    n = compact(spark, path, target_rows_per_file=5_000, order_cols=["id"])
    assert n == 10_000
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 2
    back = read_table(spark, path)
    assert back.count() == 10_000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(10_000))
