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
        # events.parquet has shipped ts two ways across corpus versions:
        # TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
        # as raw int64 nanos and floor to micros, matching how DuckDB's
        # reader truncates nanos to its native micros) and TIMESTAMP(MICROS)
        # without UTC adjustment (which Spark reads as TIMESTAMP_NTZ).
        # Dispatch on the read dtype so both layouts land on the same
        # session-UTC TIMESTAMP column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Collection renders instants in the session timezone. Pin UTC so
        # results match the oracle's naive timestamps regardless of the
        # host session's zone (NTZ -> TIMESTAMP is then value-identity).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        ts_expr = (
            F.expr("timestamp_micros(ts DIV 1000)")
            if isinstance(ts_type, LongType)
            else F.col("ts").cast("timestamp")
        )
        return df.select(
            "event_id",
            ts_expr.alias("ts"),
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
