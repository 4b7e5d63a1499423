"""Tests for the write-side surface (partitioned/bucketed sinks) and the
skew-mitigation operators (equivalence with their unsalted forms)."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.skew import salted_agg, salted_join
from implementing_scds_in_hive_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
    write_table,
)


def _skewed(spark):
    # key 'hot' holds ~90% of rows
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")],
        "k string, label string",
    )
    plain = {
        (r["id"], r["label"])
        for r in big.join(dim, "k", "inner").select("id", "label").collect()
    }
    salted = {
        (r["id"], r["label"])
        for r in salted_join(big, dim, "k", n_salts=8).select("id", "label").collect()
    }
    assert salted == plain and len(plain) > 800


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(big, dim, "k", n_salts=4, how="left")
    assert out.count() == 1000
    assert out.where("label is null").count() == big.where("k != 'hot'").count()


def test_salted_join_rejects_invalid_join_types(spark):
    import pytest

    big = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, dim, "k", how=how)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"], r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r["k"], r["n"], r["total"])
        for r in salted_agg(
            df,
            "k",
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("v"), F.sum("total")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_write_partitioned_prunes(spark, tmp_path):
    df = _skewed(spark).withColumn("part", (F.col("id") % 4).cast("int"))
    path = str(tmp_path / "parted")
    write_partitioned(df, path, ["part"])
    back = spark.read.parquet(path)
    assert back.count() == 1000
    pruned = back.where("part = 2")
    assert pruned.count() == 250
    # partition filter must appear as PartitionFilters, not a row filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan.split("PartitionFilters")[1][:80]


def test_write_bucketed_join_has_no_exchange(spark, tmp_path):
    df = _skewed(spark)
    try:
        write_bucketed(df, "t_bucket_a", ["k"], n_buckets=4, sort_cols=["k"])
        write_bucketed(
            df.select("k", F.col("v").alias("v2")), "t_bucket_b", ["k"], n_buckets=4, sort_cols=["k"]
        )
        a = spark.table("t_bucket_a")
        b = spark.table("t_bucket_b")
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_scd_merge_no_join_exchange(spark):
    """The 100 TB physical-design lever claimed in PLANS.md: production
    and staging bucketed by the business key => the merge's full-outer
    join needs no Exchange; with hash surrogate keys there is no global
    window either, so the whole merge plan is shuffle-free."""
    from datetime import datetime

    from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge

    cfg = SCDConfig(key="k", type2_cols=("v",), type1_cols=(), surrogate_col="dim_id")
    eot = datetime(9999, 12, 31, 23, 59, 59)
    t0 = datetime(2024, 1, 1)
    prod = spark.createDataFrame(
        [(i, f"u{i}", f"v{i}", 1, t0, eot, True) for i in range(100)],
        "dim_id long, k string, v string, scd_version int, "
        "scd_start_date timestamp, scd_end_date timestamp, scd_active boolean",
    )
    stg = spark.createDataFrame(
        [(f"u{i}", f"v{i}x" if i % 3 == 0 else f"v{i}") for i in range(100)],
        "k string, v string",
    )
    try:
        write_bucketed(prod, "t_dim_prod", ["k"], n_buckets=4)
        write_bucketed(stg, "t_dim_stg", ["k"], n_buckets=4)
        merged = scd2_merge(
            spark.table("t_dim_prod"),
            spark.table("t_dim_stg"),
            cfg,
            datetime(2024, 2, 1),
            plan="full_outer",
            key_strategy="hash",
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan
        assert merged.count() == 100 + 34  # 34 type-2 changes add a row each
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dim_prod")
        spark.sql("DROP TABLE IF EXISTS t_dim_stg")


def test_write_table_roundtrip(spark, tmp_path):
    df = _skewed(spark)
    path = str(tmp_path / "plain")
    write_table(df, path)
    assert spark.read.parquet(path).count() == 1000
