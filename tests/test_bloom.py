"""Bloom-filter join pruning (operators/bloom.py): no false negatives,
exact semi-join equivalence, real pruning power, and the plan shape that
makes it matter — the bitmap check is a literal Filter on the fact scan,
below the exact join's Exchange (the cross-join formulation was observed
to be inverted by PushDownLeftSemiAntiJoin; see the module docstring)."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.bloom import (
    bloom_build,
    bloom_collect,
    bloom_fill_stats,
    bloom_might_contain,
    bloom_prefilter,
    bloom_semi_join,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_no_false_negatives(spark):
    members = _keys(spark, range(0, 2000, 3))
    bloom = bloom_build(members, "k", num_bits=1 << 14)
    survived = bloom_prefilter(members, bloom, "k").count()
    assert survived == members.count()


def test_semi_join_equivalence(spark):
    fact = _keys(spark, range(5000)).withColumn("payload", F.col("k") * 2)
    dim = _keys(spark, range(0, 5000, 7))
    via_bloom = sorted(map(tuple, bloom_semi_join(fact, dim, "k", num_bits=1 << 12).collect()))
    plain = sorted(map(tuple, fact.join(dim, "k", "left_semi").collect()))
    assert via_bloom == plain


def test_prefilter_actually_prunes(spark):
    # 1000 members in a 16384-bit filter at k=3: fill ~0.17, predicted
    # FPR ~0.5%; assert non-members pass at under 5% — the pre-filter
    # must remove the overwhelming majority of the "100 TB side".
    members = _keys(spark, range(1000))
    probes = _keys(spark, range(10_000, 20_000))
    bloom = bloom_build(members, "k", num_bits=1 << 14)
    passed = bloom_prefilter(probes, bloom, "k").count()
    assert passed / probes.count() < 0.05


def test_collected_form_round_trips(spark):
    # persist-shaped path: collect once, probe from the (words, k) pair
    members = _keys(spark, [42, 77])
    bitmap, k = bloom_collect(bloom_build(members, "k", num_bits=1 << 10, num_hashes=5))
    assert k == 5 and len(bitmap) == (1 << 10) // 8
    got = _keys(spark, [41, 42, 77]).where(bloom_might_contain(bitmap, k, F.col("k")))
    vals = {r.k for r in got.collect()}
    assert {42, 77} <= vals  # planted members always pass


def test_empty_dim_gives_empty_result(spark):
    fact = _keys(spark, range(100))
    empty = _keys(spark, [])
    bloom = bloom_build(empty, "k", num_bits=1 << 10)
    assert bloom_prefilter(fact, bloom, "k").count() == 0
    assert bloom_semi_join(fact, empty, "k", num_bits=1 << 10).count() == 0


def test_fill_stats(spark):
    bloom = bloom_build(_keys(spark, range(500)), "k", num_bits=1 << 13, num_hashes=3)
    s = bloom_fill_stats(bloom).collect()[0]
    assert s.total_bits == 1 << 13
    # <= k*n set bits (hash collisions only reduce), and enough set to be real
    assert 500 < s.set_bits <= 1500
    assert abs(s.fill_factor - s.set_bits / s.total_bits) < 1e-6  # fill_factor is round(...,6)


def test_bloom_filter_sits_below_fact_exchange(spark):
    # With broadcast disabled the exact join is a shuffle join; the bloom
    # membership Filter (its element_at bit probes) must appear in the
    # fact-side subtree BELOW that Exchange — i.e. the plan filters the
    # fact scan, then shuffles only survivors. (Tree rendering prints
    # parents first, so "below" == later line, inside the fact branch.)
    fact = _keys(spark, range(2000)).withColumn("payload", F.col("k"))
    dim = _keys(spark, range(0, 2000, 5))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = bloom_semi_join(fact, dim, "k", num_bits=1 << 12)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan  # the literal form, not the join form
    lines = plan.splitlines()
    filter_line = next(i for i, l in enumerate(lines) if "getbit" in l and "Filter" in l)
    exchange_lines = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(k" in l]
    assert exchange_lines and min(exchange_lines) < filter_line
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_inner_join_equivalence(spark):
    from implementing_scds_in_hive_spark.operators.bloom import bloom_inner_join

    fact = _keys(spark, range(2000)).withColumn("fp", F.col("k") * 2)
    dim = spark.createDataFrame(
        [(v, f"d{v}") for v in range(0, 2000, 9)], "dk long, payload string"
    )
    got = sorted(
        map(
            tuple,
            bloom_inner_join(fact, dim, "k", dim_key_col="dk", num_bits=1 << 12).collect(),
        )
    )
    want = sorted(map(tuple, fact.join(dim, fact.k == dim.dk, "inner").collect()))
    assert got == want and len(got) > 0
