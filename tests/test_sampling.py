"""Unit semantics of deterministic sampling (operators/sampling.py):
partition-invariance (the property df.sample() lacks), salt
independence, exact per-stratum counts, and the zero-shuffle plan shape
of the per-row filters. Value equivalence against DuckDB runs in
test_pytest_only_oracles (sample_bernoulli/_stratified/_topk_stratum)."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    topk_per_stratum,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_is_partition_invariant(spark):
    d = _docs(spark)
    a = _ids(hash_sample(d, 0.3, salt="x"))
    b = _ids(hash_sample(d.repartition(17, "lang"), 0.3, salt="x"))
    c = _ids(hash_sample(d.coalesce(1), 0.3, salt="x"))
    assert a == b == c
    assert 0 < len(a) < 500


def test_different_salts_give_different_subsets(spark):
    d = _docs(spark)
    assert _ids(hash_sample(d, 0.3, salt="x")) != _ids(hash_sample(d, 0.3, salt="y"))


def test_nested_samples_compose(spark):
    d = _docs(spark)
    outer = hash_sample(d, 0.5, salt="a")
    inner = _ids(hash_sample(outer, 0.4, salt="b"))
    # inner sample is a subset of the outer, re-derivable independently
    assert inner <= _ids(outer)
    assert inner == (_ids(hash_sample(d, 0.4, salt="b")) & _ids(outer))


def test_stratified_rates_apply_per_stratum(spark):
    d = _docs(spark, 3000)
    out = stratified_hash_sample(
        d, {"0": 1.0, "1": 0.0}, stratum_col="lang", default_fraction=0.5, salt="s"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["0"] == 1000  # fraction 1.0 keeps everything
    assert "1" not in counts  # fraction 0.0 keeps nothing
    assert 300 < counts.get("2", 0) < 700  # ~50% default


def test_topk_exact_counts_and_determinism(spark):
    d = _docs(spark)
    out = topk_per_stratum(d, 7, strata_cols=["lang"], salt="k")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    again = topk_per_stratum(d.repartition(13), 7, strata_cols=["lang"], salt="k")
    assert _ids(out) == _ids(again)


def test_topk_caps_at_stratum_size(spark):
    d = _docs(spark, 9)  # 3 docs per stratum
    out = topk_per_stratum(d, 7, strata_cols=["lang"], salt="k")
    assert out.count() == 9


def test_assign_split_partitions_everything_once(spark):
    import pytest

    from implementing_scds_in_hive_spark.operators.sampling import assign_split

    d = _docs(spark, 2000)
    out = assign_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total partition, no drops
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stable across repartitioning
    again = assign_split(d.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(d, {"train": 0.5, "val": 0.1}, salt="s")


def test_hash_sample_plan_has_no_exchange(spark):
    d = _docs(spark)
    plan = hash_sample(d, 0.3, salt="x")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_sample_sources_are_independent(spark):
    """Re-weighting one source must not change another source's subset
    (per-source salts): the 'a' subset at (0.5, 0.25) equals the 'a'
    subset at (0.5, 0.9)."""
    from implementing_scds_in_hive_spark.operators.sampling import mixture_sample

    d = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    mix1 = mixture_sample([("a", d, 0.5), ("b", d, 0.25)], salt="t0")
    mix2 = mixture_sample([("a", d, 0.5), ("b", d, 0.9)], salt="t0")
    a1 = {r["doc_id"] for r in mix1.where("source = 'a'").collect()}
    a2 = {r["doc_id"] for r in mix2.where("source = 'a'").collect()}
    assert a1 == a2 and 0 < len(a1) < 500
    # same doc sampled independently per source: b is not a subset of a
    b1 = {r["doc_id"] for r in mix1.where("source = 'b'").collect()}
    assert not b1 <= a1


def test_mixture_sample_rejects_empty_sources():
    import pytest
    from implementing_scds_in_hive_spark.operators.sampling import mixture_sample

    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample([])


# ---------------------------------------------------------------------------
# Mixture composability property (r3 verdict polish #7): across RANDOM
# rate vectors — not just one pair — re-weighting any single source
# leaves every other source's subset bit-identical, and the re-weighted
# source's subset moves monotonically (threshold sampling: a higher
# rate strictly widens the kept set).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rate = st.integers(min_value=0, max_value=100).map(lambda p: p / 100)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rates=st.tuples(rate, rate, rate), new_rate=rate, which=st.integers(0, 2))
def test_mixture_reweight_composability(spark, rates, new_rate, which):
    from implementing_scds_in_hive_spark.operators.sampling import mixture_sample

    d = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    names = ["a", "b", "c"]
    base = list(zip(names, [d, d, d], rates))
    tweaked = list(base)
    tweaked[which] = (names[which], d, new_rate)

    def subsets(mix):
        rows = mix.collect()
        return {
            n: {r["doc_id"] for r in rows if r["source"] == n} for n in names
        }

    s1 = subsets(mixture_sample(base, salt="prop"))
    s2 = subsets(mixture_sample(tweaked, salt="prop"))
    for i, n in enumerate(names):
        if i != which:
            assert s1[n] == s2[n], f"source {n} changed when {names[which]} was re-weighted"
    lo, hi = sorted([rates[which], new_rate])
    small, big = (s1, s2) if rates[which] == lo else (s2, s1)
    assert small[names[which]] <= big[names[which]]  # monotone in rate


# --- weighted sampling ----------------------------------------------------

def test_weighted_topk_deterministic_and_partition_invariant(spark):
    from implementing_scds_in_hive_spark.operators.sampling import sample_weighted_topk

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(500)], "id long, w int"
    )
    a = {r.id for r in sample_weighted_topk(df, 50, id_col="id", weight_col="w").collect()}
    b = {
        r.id
        for r in sample_weighted_topk(
            df.repartition(13), 50, id_col="id", weight_col="w"
        ).collect()
    }
    assert a == b and len(a) == 50


def test_weighted_topk_zero_weight_never_sampled(spark):
    from implementing_scds_in_hive_spark.operators.sampling import sample_weighted_topk

    df = spark.createDataFrame(
        [(i, 0 if i % 2 else 5) for i in range(100)], "id long, w int"
    )
    got = {r.id for r in sample_weighted_topk(df, 60, id_col="id", weight_col="w").collect()}
    assert all(i % 2 == 0 for i in got)
    assert len(got) == 50  # only 50 rows are eligible


def test_weighted_topk_stratified(spark):
    from implementing_scds_in_hive_spark.operators.sampling import sample_weighted_topk

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3), 1 + i % 5) for i in range(300)],
        "id long, stratum string, w int",
    )
    out = sample_weighted_topk(df, 10, id_col="id", weight_col="w", by=["stratum"])
    counts = {r.stratum: r.cnt for r in out.groupBy("stratum").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"s0": 10, "s1": 10, "s2": 10}


def test_weighted_priority_selection_tracks_weights(spark):
    # statistical check over 400 independent salts: items with weight 9
    # must be drawn as the per-salt winner ~9x as often as weight-1 items
    from implementing_scds_in_hive_spark.operators.sampling import weighted_priority

    items = [(i, 9 if i < 10 else 1) for i in range(110)]  # total weight 190
    df = spark.createDataFrame(items, "id long, w int")
    trials = spark.range(400).select(F.col("id").alias("trial"))
    pri = df.crossJoin(trials).select(
        "trial",
        "id",
        "w",
        weighted_priority(
            F.concat(F.col("trial"), F.lit("#"), F.col("id")), F.col("w")
        ).alias("p"),
    )
    winners = (
        pri.groupBy("trial")
        .agg(F.min_by("id", F.struct(F.col("p"), F.col("id"))).alias("winner"))
        .collect()
    )
    heavy_wins = sum(1 for r in winners if r.winner < 10)
    # expected heavy share = 90/190 ~ 0.474; sd ~ 0.025 over 400 trials
    assert 0.35 < heavy_wins / 400 < 0.60


def test_weighted_topk_global_is_take_ordered(spark):
    # the global draw must be a TakeOrderedAndProject (k per partition,
    # merged on the driver) — never a full global Sort
    from implementing_scds_in_hive_spark.operators.sampling import sample_weighted_topk

    df = spark.createDataFrame([(i, 3) for i in range(100)], "id long, w int")
    plan = (
        sample_weighted_topk(df, 5, id_col="id", weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# --- temperature-based mixture balancing ---------------------------------

from implementing_scds_in_hive_spark.operators.sampling import (  # noqa: E402
    mixture_sample,
    temperature_rates,
)


def test_temperature_rates_alpha_one_is_natural():
    # alpha=1: natural proportions == the raw data, so every source is
    # kept whole (the cap binds everywhere simultaneously)
    assert temperature_rates({"a": 800, "b": 200}, alpha=1.0) == {"a": 1.0, "b": 1.0}


def test_temperature_rates_alpha_zero_is_uniform():
    # alpha=0: uniform target shares; the smallest source caps at one
    # epoch and every other source downsamples to match its count
    r = temperature_rates({"a": 800, "b": 200}, alpha=0.0)
    assert r["b"] == 1.0
    assert abs(800 * r["a"] - 200 * r["b"]) < 1e-9


def test_temperature_rates_expected_shares_match_tempered_target():
    counts = {"web": 9_000_000, "books": 400_000, "code": 100_000}
    alpha = 0.5
    r = temperature_rates(counts, alpha=alpha)
    expected = {k: counts[k] * r[k] for k in counts}
    total = sum(expected.values())
    z = sum(n ** alpha for n in counts.values())
    for k, n in counts.items():
        assert abs(expected[k] / total - n ** alpha / z) < 1e-12
    # cap respected: no source asked for more than one epoch
    assert all(0 < v <= 1.0 for v in r.values())


def test_temperature_rates_validation():
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_rates({})
    with _pt.raises(ValueError):
        temperature_rates({"a": 0})
    with _pt.raises(ValueError):
        temperature_rates({"a": 10}, alpha=-0.1)


def test_temperature_rates_feed_mixture_sample(spark):
    # end-to-end: alpha=0 over a 4:1 imbalance must realize ~equal
    # per-source counts once fed through the content-addressed sampler
    big = spark.range(4000).select(F.col("id").alias("doc_id"))
    small = spark.range(1000).select((F.col("id") + 10_000).alias("doc_id"))
    r = temperature_rates({"big": 4000, "small": 1000}, alpha=0.0)
    mix = mixture_sample([("big", big, r["big"]), ("small", small, r["small"])])
    got = {row["source"]: row["n"] for row in
           mix.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["small"] == 1000  # capped at one full epoch
    # Bernoulli at 0.25 over 4000 docs: 3-sigma ~ 80
    assert abs(got["big"] - 1000) < 150


def test_temperature_rates_cap_is_exact_under_float_roundtrip():
    # regression: the binding source's fraction came back an ulp above
    # 1.0 for some count mixes (seen at {en: 3249, other: 4697}-class
    # inputs in the stress pipeline); the clamp must pin it to the cap
    r = temperature_rates({"en": 3249, "other": 4697}, alpha=0.5)
    assert max(r.values()) == 1.0
    assert all(v <= 1.0 for v in r.values())


# --- leakage-safe split --------------------------------------------------

def test_leakage_safe_split_groups_never_straddle(spark):
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.sampling import (
        assign_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    # chains: (0,1),(1,2) one group; (10,11); isolated docs elsewhere
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 51), (51, 52), (52, 53)],
        "id_a bigint, id_b bigint",
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    # every group has exactly one split value among its members
    distinct_per_group = (
        out.groupBy("split_group")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert distinct_per_group == 1
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[50]["split"] == rows[53]["split"]  # transitive closure
    assert rows[0]["split_group"] == 0 and rows[53]["split_group"] == 50
    # isolated docs: their own group, same split the plain splitter gives
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    for i in (5, 99, 150):
        assert rows[i]["split_group"] == i and rows[i]["split"] == plain[i]


def test_leakage_safe_split_is_deterministic_across_runs(spark):
    from implementing_scds_in_hive_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id bigint")
    pairs = spark.createDataFrame([(3, 4), (4, 5)], "id_a bigint, id_b bigint")
    a = sorted(map(tuple, leakage_safe_split(docs, pairs, {"train": 0.9, "test": 0.1}).collect()))
    b = sorted(map(tuple, leakage_safe_split(docs.repartition(7), pairs, {"train": 0.9, "test": 0.1}).collect()))
    assert a == b

def test_assign_split_excludes_null_ids(spark):
    """r11 review (confirmed live): NULL-id rows fell through every
    WHEN to the LAST split, silently concentrating them in test/val
    while hash_sample drops the same rows. Both now exclude them."""
    from implementing_scds_in_hive_spark.operators.sampling import (
        assign_split,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id bigint"
    )
    out = assign_split(df, {"train": 0.9, "test": 0.1})
    assert out.count() == 2
    assert out.where("doc_id IS NULL").count() == 0


def test_temperature_rates_rejects_epochs_cap_above_one(spark):
    """r11 review: fractions above 1 are silently clamped by the hash
    samplers, so the realized mix would miss the tempered shares —
    refuse up front."""
    import pytest

    from implementing_scds_in_hive_spark.operators.sampling import (
        temperature_rates,
    )

    with pytest.raises(ValueError, match="epochs_cap"):
        temperature_rates({"web": 10**9, "books": 10**6}, alpha=0.3, epochs_cap=2.0)
    rates = temperature_rates({"web": 10**9, "books": 10**6}, alpha=0.3)
    assert all(0 < r <= 1.0 for r in rates.values())
