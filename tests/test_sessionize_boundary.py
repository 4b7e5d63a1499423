"""Boundary semantics of sessionization gaps (r2 verdict "What's
wrong" #3): Spark used to compare gaps in truncated whole seconds
(``ts.cast("long")``) while the DuckDB oracle compared fractional
``epoch()`` doubles — a true gap inside (1800.0, 1801.0) seconds
truncated to exactly 1800 and did NOT split on Spark but DID split in
DuckDB. Both engines now compare microseconds (``unix_micros`` vs
``epoch_us``); this test plants gaps of 1799.9 s (merge), exactly
1800.0 s (merge — the rule is strictly greater), and 1800.5 s (split —
the case truncation used to misclassify) and requires engine agreement
under the driver's own compare."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.plans.pipeline_ops import (
    SESSIONIZE_SQL,
    q_sessionize,
)

import sys

sys.path.insert(0, "/root/repo/scripts")
from check_oracle import spark_pandas_rows, table_hash  # noqa: E402

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _events():
    rows, eid = [], 0

    def at(user, offset_s):
        nonlocal eid
        eid += 1
        rows.append((eid, user, T0 + datetime.timedelta(seconds=offset_s)))

    at(1, 0.0)
    at(1, 1799.9)            # merge: gap < 1800 s
    at(2, 0.0)
    at(2, 1800.0)            # merge: gap == 1800 s is NOT > 1800 s
    at(3, 0.25)
    at(3, 1800.75)           # SPLIT: gap 1800.5 s — truncation trap
    at(4, 0.0)
    at(4, 1800.000001)       # SPLIT: one microsecond over the gap
    at(4, 3600.000001)       # merge onto the second session (gap 1800.0)
    return rows


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, spark):
    # the events loader (sources/registry.py) expects the driver
    # corpus's physical layout: ts stored as int64 NANOSECONDS
    d = tmp_path_factory.mktemp("sessionize_boundary")
    epoch = datetime.datetime(1970, 1, 1)

    def nanos(ts):
        td = ts - epoch
        us = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        return us * 1000

    rows = [(eid, user, nanos(ts)) for eid, user, ts in _events()]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts bigint")
    df = df.select(
        "event_id",
        "user_id",
        "ts",
        F.lit("boundary").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_boundary_gaps_agree_across_engines(spark, fixture_dir):
    scols, srows = spark_pandas_rows(q_sessionize(spark, fixture_dir))
    con = duckdb.connect()
    # the driver corpus stores ts as TIMESTAMP(NANOS), which DuckDB's
    # reader surfaces as a timestamp; this fixture stores raw int64
    # nanos (no logical type), so apply the same nanos->micros floor
    con.execute(
        "CREATE VIEW events AS SELECT event_id, user_id, "
        "make_timestamp(ts // 1000) AS ts, event_type, value, props FROM "
        f"read_parquet('{fixture_dir}/events.parquet/*.parquet')"
    )
    odf = con.execute(SESSIONIZE_SQL).fetchdf()
    orows = list(odf.itertuples(index=False, name=None))
    assert table_hash(scols, srows) == table_hash(list(odf.columns), orows)


def test_boundary_session_counts(spark, fixture_dir):
    out = q_sessionize(spark, fixture_dir)
    per_user = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # users 1 and 2 merge into one session; 3 and 4 split into two
    assert per_user == {1: 1, 2: 1, 3: 2, 4: 2}
