"""Format parity: every supported source format round-trips the same
rows, text formats refuse schema inference, and the columnar formats
keep predicate pushdown (the property that makes them the storage tier).
"""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.sources.formats import (
    hive_textfile_options,
    read_source,
    write_source,
)
from implementing_scds_in_hive_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    # timestamps/decimals aside, customer covers long/int/string/double
    return load_table(spark, sf_dir, "customer")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_round_trip(fmt, customer, tmp_path):
    path = str(tmp_path / f"customer_{fmt}")
    write_source(customer, path, fmt=fmt)
    back = read_source(customer.sparkSession, path, fmt=fmt, schema=customer.schema)
    assert _rows(back) == _rows(customer)


def test_round_trip_hive_textfile(customer, tmp_path):
    """CSV with Hive's LazySimpleSerDe conventions (^A delimiter, \\N
    nulls, no header) — the textfile table analog."""
    path = str(tmp_path / "customer_text")
    opts = hive_textfile_options()
    write_source(customer, path, fmt="csv", **opts)
    back = read_source(customer.sparkSession, path, fmt="csv", schema=customer.schema, **opts)
    assert _rows(back) == _rows(customer)


def test_text_formats_require_schema(customer, tmp_path):
    path = str(tmp_path / "c_json")
    write_source(customer, path, fmt="json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(customer.sparkSession, path, fmt="json")


def test_unknown_format_rejected(customer, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_source(customer, str(tmp_path / "x"), fmt="avro")


def test_orc_keeps_predicate_pushdown(customer, tmp_path):
    """ORC is a storage-tier format: filters must reach the scan, as
    with parquet (text formats can't do this — the reason they're
    interchange-only)."""
    path = str(tmp_path / "customer_orc")
    write_source(customer, path, fmt="orc")
    df = read_source(customer.sparkSession, path, fmt="orc").where(
        F.col("c_custkey") == 1
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_custkey" in plan.split("PushedFilters")[1][:120]


def test_schema_prunes_columnar_read(customer, tmp_path):
    """Passing a schema to a columnar read acts as projection: the
    reader's ReadSchema carries only the named columns."""
    path = str(tmp_path / "customer_prune")
    write_source(customer, path, fmt="orc")
    two = read_source(
        customer.sparkSession, path, fmt="orc",
        schema="c_custkey bigint, c_name string",
    )
    assert two.columns == ["c_custkey", "c_name"]
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "c_acctbal" not in plan
