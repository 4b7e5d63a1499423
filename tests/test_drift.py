"""Drift detectors (operators/drift.py) against independent Python
references: PSI with epsilon smoothing, two-sample chi-square
homogeneity, and the two-sample KS distance (including tie handling —
F must jump once per distinct value, a classic off-by-one)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.drift import (
    chi_square_drift,
    ks_statistic,
    psi_drift,
)


def _cats(spark, rows):
    return spark.createDataFrame([(c,) for c in rows], "cat string")


def _vals(spark, rows):
    return spark.createDataFrame([(float(v),) for v in rows], "v double")


def _py_ks(a, b):
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    return max(
        abs(sum(1 for x in a if x <= t) / na - sum(1 for x in b if x <= t) / nb)
        for t in xs
    )


def _py_chi2(a, b):
    cats = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    chi = 0.0
    for c in cats:
        oa, ob = a.count(c), b.count(c)
        ea = na * (oa + ob) / (na + nb)
        eb = nb * (oa + ob) / (na + nb)
        chi += (oa - ea) ** 2 / ea + (ob - eb) ** 2 / eb
    return chi, len(cats) - 1


def test_psi_zero_on_identical_distributions(spark):
    rows = ["x"] * 30 + ["y"] * 20 + ["z"] * 50
    out = psi_drift(_cats(spark, rows), _cats(spark, rows), "cat")
    total = out.agg({"psi_term": "sum"}).collect()[0][0]
    assert abs(total) < 1e-12


def test_psi_known_shift(spark):
    a = ["x"] * 80 + ["y"] * 20
    b = ["x"] * 50 + ["y"] * 50
    total = (
        psi_drift(_cats(spark, a), _cats(spark, b), "cat")
        .agg({"psi_term": "sum"})
        .collect()[0][0]
    )
    expect = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert abs(total - expect) < 1e-12


def test_psi_new_category_registers_via_epsilon(spark):
    a = ["x"] * 100
    b = ["x"] * 50 + ["new"] * 50
    terms = {
        r["category"]: r["psi_term"]
        for r in psi_drift(_cats(spark, a), _cats(spark, b), "cat").collect()
    }
    # frac_a for 'new' floors at 1e-6: (1e-6 - 0.5) * ln(1e-6/0.5) >> 0
    assert terms["new"] > 5
    assert terms["new"] == pytest.approx((1e-6 - 0.5) * math.log(1e-6 / 0.5), rel=1e-9)


def test_chi2_matches_reference(spark):
    a = ["x"] * 40 + ["y"] * 60
    b = ["x"] * 70 + ["y"] * 25 + ["z"] * 5
    row = chi_square_drift(_cats(spark, a), _cats(spark, b), "cat").collect()[0]
    chi, dof = _py_chi2(a, b)
    assert row["chi2"] == pytest.approx(chi, rel=1e-12)
    assert row["dof"] == dof
    assert (row["n_a"], row["n_b"]) == (100, 100)


def test_ks_identical_zero_disjoint_one(spark):
    xs = [1, 2, 3, 4, 5]
    same = ks_statistic(_vals(spark, xs), _vals(spark, xs), "v").collect()[0]
    assert same["ks"] == 0.0
    disj = ks_statistic(_vals(spark, [1, 2, 3]), _vals(spark, [10, 11]), "v").collect()[0]
    assert disj["ks"] == 1.0


def test_ks_empty_side_raises(spark):
    """ADVICE r5: an empty side used to yield silent NaN/inf; now a
    ValueError names the empty sample."""
    with pytest.raises(ValueError, match="empty side"):
        ks_statistic(_vals(spark, []), _vals(spark, [1, 2]), "v")
    with pytest.raises(ValueError, match="empty side"):
        ks_statistic(_vals(spark, [1, 2]), _vals(spark, []), "v")


def test_ks_with_ties_matches_reference(spark):
    a = [1.0, 1.0, 2.0, 3.0, 3.0, 3.0]
    b = [1.0, 2.0, 2.0, 2.0, 4.0]
    got = ks_statistic(_vals(spark, a), _vals(spark, b), "v").collect()[0]
    assert got["ks"] == pytest.approx(_py_ks(a, b), abs=1e-12)
    assert (got["n_a"], got["n_b"]) == (6, 5)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    b=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_ks_random_matches_reference(spark, a, b):
    got = ks_statistic(_vals(spark, a), _vals(spark, b), "v").collect()[0]
    assert got["ks"] == pytest.approx(_py_ks(a, b), abs=1e-12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(st.sampled_from("pqr"), min_size=2, max_size=40),
    b=st.lists(st.sampled_from("pqr"), min_size=2, max_size=40),
)
def test_chi2_random_matches_reference(spark, a, b):
    row = chi_square_drift(_cats(spark, a), _cats(spark, b), "cat").collect()[0]
    chi, dof = _py_chi2(a, b)
    assert row["chi2"] == pytest.approx(chi, rel=1e-9)
    assert row["dof"] == dof

def test_null_category_is_one_category_not_two(spark):
    """r11 review: a USING join never matches NULL keys, so identical
    NULL fractions on both sides split into two unmatched rows and
    registered massive phantom drift."""
    from implementing_scds_in_hive_spark.operators.drift import (
        chi_square_drift,
        psi_drift,
    )

    a = spark.createDataFrame(
        [("x",)] * 9 + [(None,)], "cat string"
    )
    b = spark.createDataFrame(
        [("x",)] * 9 + [(None,)], "cat string"
    )
    psi = psi_drift(a, b, "cat").agg({"psi_term": "sum"}).collect()[0][0]
    assert abs(psi) < 1e-9, psi
    chi = chi_square_drift(a, b, "cat").collect()[0]
    assert chi["chi2"] < 1e-9 and chi["dof"] == 1  # x and NULL: 2 cats


def test_ks_statistic_ignores_null_values(spark):
    """r11 review: NULLs grouped as a distinct smallest value and
    inflated one CDF — identical samples plus one-sided NULLs read as
    KS ~ 0.33."""
    from implementing_scds_in_hive_spark.operators.drift import ks_statistic

    a = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)] * 50, "v double"
    )
    b = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    row = ks_statistic(a, b, "v").collect()[0]
    assert row["ks"] < 1e-9, row
    assert row["n_a"] == 100 and row["n_b"] == 100


def test_psi_chi2_oracles_lockstep_on_null_categories(spark, tmp_path):
    """r12 (ADVICE): the engine joins drift categories null-safely
    (NULL is one category), but the PSI/chi2 oracle SQL still used a
    non-null-safe FULL OUTER JOIN — green only because the driver
    events table has no NULL event_type. Replay BOTH sides on a corpus
    WITH NULL categories and require the driver-identical hash match."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo/scripts")
    from check_oracle import spark_pandas_rows, table_hash

    from implementing_scds_in_hive_spark.plans.pipeline_ops import (
        DRIFT_CHI2_SQL,
        PSI_EVENT_DRIFT_SQL,
        q_drift_chi2_events,
        q_psi_event_drift,
    )

    rows = []
    # first half: skewed toward 'click', some NULLs; second half:
    # different mix, different NULL fraction — NULL must be ONE
    # category matched across sides, not two unmatched rows
    for d, et, n in [
        (5, "click", 30), (5, "view", 10), (5, None, 6),
        (20, "click", 12), (20, "view", 25), (20, None, 2), (20, "buy", 5),
    ]:
        rows += [(f"2024-03-{d:02d} 12:00:00", et)] * n
    # full events schema — load_table("events") projects all six cols
    df = (
        spark.createDataFrame(rows, "ts_s string, event_type string")
        .select(F.to_timestamp("ts_s").alias("ts"), "event_type")
        .withColumn("event_id", F.monotonically_increasing_id())
        .withColumn("user_id", F.lit(1).cast("long"))
        .withColumn("value", F.lit(1.0))
        .withColumn("props", F.create_map(F.lit("k"), F.lit("v")))
    )
    events_path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(events_path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{events_path}/*.parquet')"
    )
    for fn, sql in [
        (q_psi_event_drift, PSI_EVENT_DRIFT_SQL),
        (q_drift_chi2_events, DRIFT_CHI2_SQL),
    ]:
        scols, srows = spark_pandas_rows(fn(spark, str(tmp_path)))
        odf = con.execute(sql).fetchdf()
        orows = list(odf.itertuples(index=False, name=None))
        assert table_hash(scols, srows) == table_hash(
            list(odf.columns), orows
        ), fn.__name__
    con.close()
