"""The registry fits the driver's 50-entry budget by folding redundant
queries out (SCD branch steps subsumed by the hash-checked flagship,
single-function window variants subsumed by window_analytics, ...).
Folding must not lose verification: every folded query keeps its DuckDB
oracle and is value-checked here with the same compare the driver uses
(row count + sorted column names + order-insensitive value hash), plus
the driver's pandas round-trip."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")
from check_oracle import spark_pandas_rows, table_hash  # noqa: E402

from implementing_scds_in_hive_spark.plans import pipeline_ops, relational, scd_queries

CASES = [
    (name, mod.PYTEST_ONLY_QUERIES[name], mod.PYTEST_ONLY_ORACLES[name])
    for mod in (scd_queries, relational, pipeline_ops)
    for name in mod.PYTEST_ONLY_QUERIES
]

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_pytest_only_query_matches_oracle(name, fn, sql, spark, sf_dir, duck):
    # hash post-pandas values on BOTH sides, mirroring the driver's
    # collection path (toPandas/fetchdf, not collect/fetchall — r2
    # verdict #2: fetchall's exact Python ints masked the
    # HUGEINT->float64 sessionize mismatch)
    scols, srows = spark_pandas_rows(fn(spark, sf_dir))
    odf = duck.execute(sql).fetchdf()
    orows = list(odf.itertuples(index=False, name=None))
    assert table_hash(scols, srows) == table_hash(list(odf.columns), orows)
