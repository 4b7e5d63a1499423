"""End-to-end execution of the generated MERGE against a real Delta
table — the deployment path BASELINE.md names ("Spark SQL +
Delta/Iceberg SCD merge operations").

This container ships no lake format (no ``delta-spark`` package, no
delta jars on the Spark classpath), so the test skips with an explicit
reason; on any environment with delta-spark installed it runs for real:
create the dim_user golden fixture as a Delta table, execute
``scd2_merge_statements`` verbatim through ``spark.sql``, and compare
the post-MERGE table to the DataFrame plan (``scd2_merge``) row for
row. The DuckDB emulation in test_merge_sql.py remains the
always-running semantic anchor.

Cite: /root/reference/SCD_script.txt:8-155 (the eight-statement Hive
pipeline the single MERGE replaces).
"""

import pytest

from implementing_scds_in_hive_spark.operators.merge_sql import scd2_merge_statements
from implementing_scds_in_hive_spark.operators.scd import scd2_merge
from tests.test_scd_golden import AS_OF, CFG, EOT, PROD_SCHEMA, STG_SCHEMA, T0

AS_OF_SQL = "TIMESTAMP '2024-05-01 12:00:00'"

delta = pytest.importorskip(
    "delta", reason="delta-spark not installed in this container"
)


@pytest.fixture(scope="module")
def delta_spark():
    """A SparkSession with the Delta extension. Local-mode Spark shares
    one JVM per process: if a non-Delta session already exists, its
    builder config can't be retrofitted — skip rather than half-run."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        ext = active.conf.get("spark.sql.extensions", "")
        if "DeltaSparkSessionExtension" not in ext:
            pytest.skip("active SparkSession lacks the Delta extension")
        return active
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-e2e")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.shuffle.partitions", "4")
    )
    return delta.configure_spark_with_delta_pip(builder).getOrCreate()


def test_merge_statements_execute_on_delta(delta_spark, tmp_path):
    spark = delta_spark
    prod_rows = [
        (1, "user1", True, "address1", "123456789", "John", "Doe", 1980, 1, T0, EOT, True),
        (2, "user2", False, "address2", None, "Alice", "Smith", 1990, 1, T0, EOT, True),
    ]
    stg_rows = [
        ("user1", "John", "Doe", 1985, True, "address1", "987654321"),
        ("user2", "Alice", "Smith", 1990, True, "address2", None),
        ("user3", "Emma", "Johnson", 1985, True, "address3", "987654321"),
    ]
    prod = spark.createDataFrame(prod_rows, PROD_SCHEMA)
    staging = spark.createDataFrame(stg_rows, STG_SCHEMA)

    path = str(tmp_path / "dim_user_delta")
    prod.write.format("delta").save(path)
    spark.sql(f"CREATE TABLE dim USING DELTA LOCATION '{path}'")
    staging.createOrReplaceTempView("staging_batch")
    try:
        for stmt in scd2_merge_statements(CFG, as_of_expr=AS_OF_SQL):
            spark.sql(stmt)
        merged = spark.table("dim")
        expected = scd2_merge(prod, staging, CFG, AS_OF)
        key = lambda r: (r["login"], r["scd_version"])  # noqa: E731
        got = {
            key(r): (r["premium_user"], r["address"], r["phone"], r["name"],
                     r["surname"], r["year_of_birth"], r["scd_start_date"],
                     r["scd_end_date"], r["scd_active"])
            for r in merged.collect()
        }
        want = {
            key(r): (r["premium_user"], r["address"], r["phone"], r["name"],
                     r["surname"], r["year_of_birth"], r["scd_start_date"],
                     r["scd_end_date"], r["scd_active"])
            for r in expected.collect()
        }
        assert got == want and len(got) == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS dim")
