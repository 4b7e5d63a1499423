"""Parquet table registry for the driver test corpus (TESTDATA.md).

The reference's only source is a Hive metastore table scan
(/root/reference/SCD_script.txt:10). Here sources are parquet
directories; at scale the same call sites take Delta/Iceberg tables.
Loads are lazy DataFrames — column pruning and predicate pushdown reach
the parquet scan via Catalyst (check ``PushedFilters``/``ReadSchema`` in
``df.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read the raw int64 nanos and convert
        # with exact integer arithmetic (floor to micros, matching how
        # DuckDB's reader truncates nanos to its native micros).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() yields an instant; collection renders it in
        # the session timezone. Pin UTC so results match the oracle's
        # naive timestamps regardless of the host session's zone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        return df.select(
            "event_id",
            F.expr("timestamp_micros(ts DIV 1000)").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input arrives under-partitioned
    (a single small parquet file = one task = zero parallelism for
    CPU-heavy per-row work). On a real lake the scan is already split by
    maxPartitionBytes; this guards the small-file edge."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
