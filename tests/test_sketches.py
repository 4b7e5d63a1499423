"""Mergeable-sketch semantics (operators/sketches.py).

The driver-style value-hash checks for the two registry queries live in
test_pytest_only_oracles.py; this file proves the *sketch algebra* —
exact-below-k, merge == sketch-of-union (the property that makes
per-partition / per-day sketches composable at 100 TB), estimator
accuracy bounds, and histogram additivity."""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.sketches import (
    binned_histogram,
    binned_percentiles,
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _vals(spark, rows, group="g"):
    return spark.createDataFrame([(group, v) for v in rows], "g string, v long")


def test_kmv_exact_below_k(spark):
    df = _vals(spark, range(40))
    out = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert len(out) == 1
    assert out[0].kmv_size == 40
    assert out[0].est_distinct == 40.0


def test_kmv_ignores_duplicates(spark):
    df = _vals(spark, [1, 1, 1, 2, 2, 3])
    out = kmv_distinct(df, ["g"], "v", k=8).collect()[0]
    assert out.kmv_size == 3 and out.est_distinct == 3.0


@pytest.mark.parametrize("portable", [False, True])
def test_kmv_estimate_within_bound(spark, portable):
    # 5000 distinct values, k=256 -> expected relative error
    # ~ 1/sqrt(254) ~ 6%; assert a loose 3-sigma-ish 20% bound.
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    out = kmv_distinct(df, ["g"], "v", k=256, portable=portable).collect()[0]
    assert out.kmv_size == 256
    assert abs(out.est_distinct - 5000) / 5000 < 0.20


def test_kmv_merge_equals_sketch_of_union(spark):
    # merge(sketch(A), sketch(B)) must equal sketch(A UNION B) EXACTLY
    # (same bottom-k arrays), including overlapping values and a group
    # present on only one side.
    a = spark.createDataFrame(
        [("x", v) for v in range(0, 300, 2)] + [("only_a", v) for v in range(10)],
        "g string, v long",
    )
    b = spark.createDataFrame([("x", v) for v in range(150, 450)], "g string, v long")
    k = 32
    merged = kmv_merge(
        kmv_sketch(a, ["g"], "v", k=k),
        kmv_sketch(b, ["g"], "v", k=k),
        ["g"],
        k=k,
    )
    direct = kmv_sketch(a.unionByName(b), ["g"], "v", k=k)
    m = {r.g: r.kmv for r in merged.collect()}
    d = {r.g: r.kmv for r in direct.collect()}
    assert m == d
    # and the estimates therefore agree too
    em = {r.g: r.est_distinct for r in kmv_estimate(merged, ["g"], k=k).collect()}
    ed = {r.g: r.est_distinct for r in kmv_estimate(direct, ["g"], k=k).collect()}
    assert em == ed


def test_kmv_two_level_equals_single_window(spark):
    # the fanout pre-rank is an optimization, not an approximation:
    # bottom-k must be identical for any fanout
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") * 7919).alias("v")
    )
    base = {r.g: r.kmv for r in kmv_sketch(df, ["g"], "v", k=16, fanout=1).collect()}
    for fanout in (4, 64):
        got = {r.g: r.kmv for r in kmv_sketch(df, ["g"], "v", k=16, fanout=fanout).collect()}
        assert got == base


def test_histogram_counts_add(spark):
    # hist(A) + hist(B) == hist(A UNION B): the merge is a plain SUM —
    # what makes per-day percentile summaries composable.
    a = _vals(spark, range(0, 500, 3))
    b = _vals(spark, range(100, 700, 7))
    kw = dict(lo=0.0, hi=600.0, num_bins=20)
    ha = binned_histogram(a, ["g"], "v", **kw)
    hb = binned_histogram(b, ["g"], "v", **kw)
    summed = (
        ha.unionByName(hb)
        .groupBy("g", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = binned_histogram(a.unionByName(b), ["g"], "v", **kw)
    assert sorted(map(tuple, summed.collect())) == sorted(map(tuple, direct.collect()))


def test_histogram_clamps_out_of_range(spark):
    df = _vals(spark, [-50, 0, 599, 600, 10_000])
    rows = {r.bucket: r.cnt for r in binned_histogram(df, ["g"], "v", lo=0.0, hi=600.0, num_bins=6).collect()}
    assert rows[0] == 2          # -50 clamps into bucket 0 alongside 0
    assert rows[5] == 3          # 599 lands in the last bucket; 600 and 10k clamp to it


def test_binned_percentile_within_one_bin(spark):
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 1000) for _ in range(4000)]
    df = _vals(spark, [int(v * 1000) for v in vals])  # long col, scaled
    est = binned_percentiles(
        df, ["g"], "v", lo=0.0, hi=1_000_000.0, num_bins=500, qs=(0.5, 0.9)
    ).collect()[0]
    width = 1_000_000.0 / 500
    svals = sorted(int(v * 1000) for v in vals)
    for q, got in ((0.5, est.p50), (0.9, est.p90)):
        import math
        exact = svals[math.ceil(q * len(svals)) - 1]
        assert abs(got - exact) <= width + 1e-6


def test_percentile_group_with_all_values_below_lo(spark):
    # degenerate range: everything clamps to bucket 0 -> estimate is the
    # first bucket's upper edge, never NULL / missing rows
    df = _vals(spark, [-5, -4, -3])
    out = binned_percentiles(df, ["g"], "v", lo=0.0, hi=100.0, num_bins=10, qs=(0.5,)).collect()
    assert len(out) == 1 and out[0].p50 == 10.0


def test_kmv_jaccard_exact_when_below_k(spark):
    # both sketches below k: union slice holds every hash, so the
    # estimates are EXACT set statistics
    from implementing_scds_in_hive_spark.operators.sketches import kmv_jaccard

    a = _vals(spark, range(0, 30))        # {0..29}
    b = _vals(spark, range(20, 50))       # {20..49}; overlap {20..29} = 10
    sa = kmv_sketch(a, ["g"], "v", k=64)
    sb = kmv_sketch(b, ["g"], "v", k=64)
    r = kmv_jaccard(sa, sb, ["g"], k=64).collect()[0]
    assert r.union_est == 50.0
    assert r.intersection_est == 10.0
    assert abs(r.jaccard_est - 10 / 50) < 1e-6


def test_kmv_jaccard_estimates_within_bound(spark):
    from implementing_scds_in_hive_spark.operators.sketches import kmv_jaccard

    # |A|=|B|=6000, overlap 3000 -> J = 3000/9000 = 1/3; k=512
    a = _vals(spark, range(0, 6000))
    b = _vals(spark, range(3000, 9000))
    sa = kmv_sketch(a, ["g"], "v", k=512)
    sb = kmv_sketch(b, ["g"], "v", k=512)
    r = kmv_jaccard(sa, sb, ["g"], k=512).collect()[0]
    assert abs(r.jaccard_est - 1 / 3) / (1 / 3) < 0.25
    assert abs(r.union_est - 9000) / 9000 < 0.20
    assert abs(r.intersection_est - 3000) / 3000 < 0.35


def test_kmv_jaccard_disjoint_sets(spark):
    from implementing_scds_in_hive_spark.operators.sketches import kmv_jaccard

    a = _vals(spark, range(0, 1000))
    b = _vals(spark, range(50_000, 51_000))
    r = kmv_jaccard(
        kmv_sketch(a, ["g"], "v", k=128), kmv_sketch(b, ["g"], "v", k=128), ["g"], k=128
    ).collect()[0]
    assert r.jaccard_est == 0.0 and r.intersection_est == 0.0


def test_rolling_distinct_from_daily_sketches(spark):
    # the operational pattern exact COUNT(DISTINCT) cannot serve: keep one
    # tiny sketch per day, answer any rolling window by merging — here a
    # 3-day window over 5 days of synthetic user activity
    from pyspark.sql import functions as F

    days = {d: range(d * 60, d * 60 + 200) for d in range(5)}  # overlapping users
    daily = {
        d: kmv_sketch(_vals(spark, v, group=str(d)).select(F.lit("g").alias("g"), "v"), ["g"], "v", k=256)
        for d, v in days.items()
    }
    for end in range(2, 5):
        window = [daily[d] for d in (end - 2, end - 1, end)]
        merged = window[0]
        for s in window[1:]:
            merged = kmv_merge(merged, s, ["g"], k=256)
        est = kmv_estimate(merged, ["g"], k=256).collect()[0]
        truth = len(set().union(*[set(days[d]) for d in (end - 2, end - 1, end)]))
        # truth = 320 per window at k=256 -> estimate is exact-ish (<k exact)
        assert est.est_distinct == float(truth) if truth < 256 else abs(est.est_distinct - truth) / truth < 0.2


# --- hypothesis property suite -------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SETS = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 500)),
    min_size=0,
    max_size=120,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(a_rows=SETS, b_rows=SETS, k=st.sampled_from([4, 16, 64]))
def test_property_kmv_merge_is_sketch_of_union(spark, a_rows, b_rows, k):
    schema = "g string, v long"
    a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)
    merged = {
        r.g: r.kmv
        for r in kmv_merge(
            kmv_sketch(a, ["g"], "v", k=k), kmv_sketch(b, ["g"], "v", k=k), ["g"], k=k
        ).collect()
    }
    direct = {
        r.g: r.kmv for r in kmv_sketch(a.unionByName(b), ["g"], "v", k=k).collect()
    }
    assert merged == direct
    # and exact-below-k: any group with < k true distincts is EXACT
    truth = {}
    for g, v in a_rows + b_rows:
        truth.setdefault(g, set()).add(v)
    for g, vals in truth.items():
        if len(vals) < k:
            assert len(merged[g]) == len(vals)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=SETS, nb=st.sampled_from([5, 20]))
def test_property_histograms_add(spark, rows, nb):
    schema = "g string, v long"
    mid = len(rows) // 2
    a_rows, b_rows = rows[:mid], rows[mid:]
    kw = dict(lo=0.0, hi=500.0, num_bins=nb)
    a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)
    summed = sorted(
        map(
            tuple,
            binned_histogram(a, ["g"], "v", **kw)
            .unionByName(binned_histogram(b, ["g"], "v", **kw))
            .groupBy("g", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect(),
        )
    )
    direct = sorted(
        map(tuple, binned_histogram(a.unionByName(b), ["g"], "v", **kw).collect())
    )
    assert summed == direct


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(st.integers(-(10**9), 10**9), min_size=0, max_size=150, unique=True))
def test_property_bloom_never_false_negative(spark, keys):
    from implementing_scds_in_hive_spark.operators.bloom import bloom_build, bloom_prefilter

    schema = "k long"
    df = (
        spark.createDataFrame([(v,) for v in keys], schema)
        if keys
        else spark.createDataFrame([], schema)
    )
    bloom = bloom_build(df, "k", num_bits=1 << 12)
    assert bloom_prefilter(df, bloom, "k").count() == len(keys)


def test_merged_histogram_percentiles_match_direct(spark):
    # per-day histograms merged then estimated == percentiles computed
    # over the union directly — the stored-summary rolling pattern
    from implementing_scds_in_hive_spark.operators.sketches import (
        merge_histograms,
        percentiles_from_histogram,
    )

    kw = dict(lo=0.0, hi=1000.0, num_bins=100)
    day1 = _vals(spark, range(0, 600, 3))
    day2 = _vals(spark, range(200, 900, 2))
    merged = merge_histograms(
        binned_histogram(day1, ["g"], "v", **kw),
        binned_histogram(day2, ["g"], "v", **kw),
        ["g"],
    )
    got = percentiles_from_histogram(merged, ["g"], qs=(0.5, 0.9), **kw).collect()[0]
    want = binned_percentiles(day1.unionByName(day2), ["g"], "v", qs=(0.5, 0.9), **kw).collect()[0]
    assert (got.p50, got.p90) == (want.p50, want.p90)


# --- count-min sketch -----------------------------------------------------

from implementing_scds_in_hive_spark.operators.sketches import (  # noqa: E402
    cms_heavy_hitters,
    cms_lookup,
    cms_merge,
    cms_sketch,
)


def _events(spark, rows):
    return spark.createDataFrame([("g", v) for v in rows], "g string, v long")


@pytest.mark.parametrize("portable", [False, True])
def test_cms_never_underestimates(spark, portable):
    # 3 values with known exact counts; CMS point estimates must be
    # >= truth for every value (the no-false-negative side), and with
    # width far above cardinality, exactly equal.
    df = _events(spark, [1] * 7 + [2] * 3 + [3])
    sk = cms_sketch(df, ["g"], "v", depth=4, width=1024, portable=portable)
    probes = _events(spark, [1, 2, 3])
    got = {
        r.v: r.est_count
        for r in cms_lookup(sk, probes, ["g"], "v", depth=4, width=1024,
                            portable=portable).collect()
    }
    assert got == {1: 7, 2: 3, 3: 1}


def test_cms_unseen_value_estimates_zero(spark):
    sk = cms_sketch(_events(spark, [1, 2, 3]), ["g"], "v", width=1024)
    probes = _events(spark, [99])
    out = cms_lookup(sk, probes, ["g"], "v", width=1024).collect()
    assert out[0].est_count == 0


def test_cms_merge_equals_sketch_of_union(spark):
    # merge(cms(A), cms(B)) == cms(A UNION ALL B) EXACTLY — counters are
    # plain sums, which is what makes stored per-day sketches composable.
    a = _events(spark, [1, 1, 2, 5])
    b = _events(spark, [2, 3, 3, 5])
    sa = cms_sketch(a, ["g"], "v", depth=4, width=64)
    sb = cms_sketch(b, ["g"], "v", depth=4, width=64)
    merged = {
        (r.row, r.col): r.cnt
        for r in cms_merge(sa, sb, ["g"]).collect()
    }
    union = {
        (r.row, r.col): r.cnt
        for r in cms_sketch(a.unionByName(b), ["g"], "v", depth=4, width=64).collect()
    }
    assert merged == union


def test_cms_heavy_hitters_finds_all_true_hitters(spark):
    # tiny width=8 forces collisions: overestimates may ADD rows but can
    # never drop a true heavy hitter.
    rows = [10] * 30 + [20] * 25 + list(range(100, 140))
    df = _events(spark, rows)
    hh_tight = {
        r.v for r in cms_heavy_hitters(
            df, ["g"], "v", min_count=25, depth=4, width=8).collect()
    }
    assert {10, 20} <= hh_tight
    # comfortable sizing: estimates are exact, so the survivor set is
    # exactly the true one.
    hh_wide = {
        r.v for r in cms_heavy_hitters(
            df, ["g"], "v", min_count=25, depth=4, width=2048).collect()
    }
    assert hh_wide == {10, 20}


def test_cms_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 1)] * 2, "g string, v long"
    )
    sk = cms_sketch(df, ["g"], "v", width=256)
    probes = spark.createDataFrame([("a", 1), ("b", 1)], "g string, v long")
    got = {r.g: r.est_count for r in cms_lookup(sk, probes, ["g"], "v", width=256).collect()}
    assert got == {"a": 5, "b": 2}

def test_kmv_sketch_ignores_null_values(spark):
    """r11 review (confirmed live): the portable hash of NULL is NULL,
    which consumed a rank slot and then dropped out of collect_list —
    capping the sketch at k-1 so kmv_estimate's 'n < k is exact' branch
    reported ~k-1 distinct for ANY true cardinality. COUNT(DISTINCT)
    semantics ignore NULLs; so must the sketch."""
    from implementing_scds_in_hive_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("g", f"v{i}") for i in range(200)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, v string")
    for portable in (True, False):
        sk = kmv_sketch(df, ["g"], "v", k=64, portable=portable)
        est = kmv_estimate(sk, ["g"], k=64, portable=portable).collect()[0][
            "est_distinct"
        ]
        assert 140 < est < 300, (portable, est)
        clean = kmv_sketch(
            df.where("v IS NOT NULL"), ["g"], "v", k=64, portable=portable
        )
        assert sk.collect()[0]["kmv"] == clean.collect()[0]["kmv"]


def test_binned_histogram_ignores_null_values(spark):
    """r11 review (confirmed live): NULLs landed in bucket 0
    (greatest(0, NULL) = 0 in Spark) and dragged every percentile
    toward lo."""
    from implementing_scds_in_hive_spark.operators.sketches import (
        binned_histogram,
        binned_percentiles,
    )

    rows = [("g", 90.0)] * 5 + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    hist = binned_histogram(df, ["g"], "v", lo=0.0, hi=100.0, num_bins=10)
    assert hist.agg({"cnt": "sum"}).collect()[0][0] == 5
    row = binned_percentiles(
        df, ["g"], "v", lo=0.0, hi=100.0, num_bins=10, qs=(0.5,)
    ).collect()[0]
    p = row[[c for c in row.asDict() if c != "g"][0]]
    assert p >= 90.0, p


def test_binned_histogram_rejects_degenerate_range(spark):
    """r12 review: lo >= hi made the bin width zero/negative, silently
    clamping every value into bucket 0 (and percentiles below lo)
    instead of erroring."""
    from implementing_scds_in_hive_spark.operators.sketches import (
        binned_histogram,
        binned_percentiles,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="lo < hi"):
        binned_histogram(df, [], "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="lo < hi"):
        binned_percentiles(df, [], "v", lo=9.0, hi=1.0)
    with pytest.raises(ValueError, match="num_bins"):
        binned_histogram(df, [], "v", lo=0.0, hi=1.0, num_bins=0)
