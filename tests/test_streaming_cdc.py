"""Stream-vs-batch parity for the CDC operation stream: driving
cdc_stream over a directory of per-batch files (availableNow,
maxFilesPerTrigger=1) must land the dimension in exactly the state of
applying cdc_apply per batch in sequence — including a delete in one
micro-batch and the same key's resurrection in the next, the case
where batch boundaries matter most."""

from datetime import datetime

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

    streamed = _snapshot(spark.read.parquet(prod_path))

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
