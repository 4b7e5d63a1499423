"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the single-pass SCD2 merge over the customer dimension
    fixture at sf0.001 (SURVEY §2.8 C1+C2)."""
    from implementing_scds_in_hive_spark.plans.scd_queries import q_scd2_merge

    return q_scd2_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from implementing_scds_in_hive_spark.plans import registry as plan_registry

    return plan_registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins of ``queries()`` (ANSI SQL over the shared parquet
    views). Keys absent here get the driver's weaker rows-only check."""
    from implementing_scds_in_hive_spark.plans import registry as plan_registry

    return plan_registry.oracles()
