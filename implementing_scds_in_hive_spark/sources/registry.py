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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
