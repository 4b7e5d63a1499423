"""Streaming drift monitoring: the live category-count table
(streaming/sketch_stream.py:category_count_stream) must equal the batch
group-by of all events exactly, survive crashes in the
publish-to-checkpoint window via its batch-id watermark (additive state
cannot absorb replays), and feed psi_from_counts to the same PSI
psi_drift computes from the raw data."""

import time

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.drift import psi_drift, psi_from_counts
from implementing_scds_in_hive_spark.streaming.sketch_stream import category_count_stream
from implementing_scds_in_hive_spark.sources.snapshot import read_table


BATCHES = [
    [("click",)] * 30 + [("view",)] * 10,
    [("click",)] * 10 + [("view",)] * 25 + [("purchase",)] * 5,
    [("view",)] * 40 + [("purchase",)] * 15,
]


def _write_batches(spark, stg):
    for chunk in BATCHES:
        spark.createDataFrame(chunk, "event_type string").coalesce(1).write.mode(
            "append"
        ).parquet(stg)
        time.sleep(0.05)


def _run(spark, stg, counts_path, ckpt, crash_hook=None):
    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stg)
    )
    q = category_count_stream(
        stream,
        counts_path,
        checkpoint_dir=ckpt,
        cat_col="event_type",
        crash_hook=crash_hook,
    )
    q.awaitTermination(120)


def _all_events(spark):
    return spark.createDataFrame(
        [r for chunk in BATCHES for r in chunk], "event_type string"
    )


def test_streamed_counts_equal_batch_groupby(spark, tmp_path):
    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    counts_path = str(tmp_path / "counts")
    _run(spark, stg, counts_path, str(tmp_path / "ckpt"))

    streamed = {
        r["category"]: r["n"] for r in read_table(spark, counts_path).collect()
    }
    direct = {
        r["event_type"]: r["cnt"]
        for r in _all_events(spark).groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert streamed == direct


def test_crash_replay_does_not_double_count(spark, tmp_path):
    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    counts_path = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    crashed = {"done": False}

    def hook(batch_id, phase):
        # die once AFTER the counts table was replaced but BEFORE the
        # checkpoint commits — the restart replays this batch, and only
        # the watermark guard stops a double count
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between publish and commit")

    with pytest.raises(Exception):
        _run(spark, stg, counts_path, ckpt, crash_hook=hook)
    _run(spark, stg, counts_path, ckpt)  # restart from checkpoint

    streamed = {
        r["category"]: r["n"] for r in read_table(spark, counts_path).collect()
    }
    direct = {
        r["event_type"]: r["cnt"]
        for r in _all_events(spark).groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert streamed == direct


def test_psi_from_live_counts_matches_psi_drift(spark, tmp_path):
    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    counts_path = str(tmp_path / "counts")
    _run(spark, stg, counts_path, str(tmp_path / "ckpt"))

    # reference snapshot = first batch only (the "before" distribution)
    ref_df = spark.createDataFrame(BATCHES[0], "event_type string")
    ref_counts = ref_df.groupBy(F.col("event_type").alias("category")).agg(
        F.count("*").alias("n")
    )
    live = read_table(spark, counts_path).select("category", "n")
    via_counts = {
        r["category"]: r["psi_term"]
        for r in psi_from_counts(live, ref_counts).collect()
    }
    via_raw = {
        r["category"]: r["psi_term"]
        for r in psi_drift(_all_events(spark), ref_df, "event_type").collect()
    }
    assert via_counts.keys() == via_raw.keys()
    for k in via_raw:
        assert via_counts[k] == pytest.approx(via_raw[k], rel=1e-12)


# --- streaming PCA moments -----------------------------------------------

def _vec_batches():
    import numpy as np

    rng = np.random.default_rng(7)
    return [
        [(float(i + b * 50), [float(x) for x in rng.normal(size=8)]) for i in range(50)]
        for b in range(3)
    ]


def _write_vec_batches(spark, stg, batches):
    for chunk in batches:
        spark.createDataFrame(chunk, "w double, embedding array<double>").coalesce(
            1
        ).write.mode("append").parquet(stg)
        time.sleep(0.05)


def _run_moments(spark, stg, path, ckpt, crash_hook=None):
    from implementing_scds_in_hive_spark.streaming.sketch_stream import moment_stream

    stream = (
        spark.readStream.schema("w double, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(stg)
    )
    q = moment_stream(
        stream, path, checkpoint_dir=ckpt, vec_col="embedding", dim=8,
        crash_hook=crash_hook,
    )
    q.awaitTermination(120)


def test_streamed_moments_equal_batch_and_fit_matches(spark, tmp_path):
    import numpy as np

    from implementing_scds_in_hive_spark.operators.pca import (
        covariance_moments,
        pca_fit,
        pca_fit_from_moments,
    )

    batches = _vec_batches()
    stg = str(tmp_path / "vecs")
    _write_vec_batches(spark, stg, batches)
    path = str(tmp_path / "moments")
    _run_moments(spark, stg, path, str(tmp_path / "ckpt"))

    row = read_table(spark, path).collect()[0]
    all_vecs = spark.createDataFrame(
        [r for chunk in batches for r in chunk], "w double, embedding array<double>"
    )
    n, mean, cov = covariance_moments(all_vecs, dim=8)
    assert row["n"] == n
    np.testing.assert_allclose(np.array(row["sumx"]) / n, mean, rtol=1e-9)
    live = pca_fit_from_moments(row["n"], row["sumx"], row["xtx"], 3, dim=8)
    direct = pca_fit(all_vecs, 3, dim=8)
    np.testing.assert_allclose(live.components, direct.components, atol=1e-8)
    np.testing.assert_allclose(
        live.explained_variance, direct.explained_variance, rtol=1e-8
    )


def test_moment_stream_crash_replay_no_double_count(spark, tmp_path):
    batches = _vec_batches()
    stg = str(tmp_path / "vecs")
    _write_vec_batches(spark, stg, batches)
    path = str(tmp_path / "moments")
    ckpt = str(tmp_path / "ckpt")
    crashed = {"done": False}

    def hook(batch_id, phase):
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between publish and commit")

    with pytest.raises(Exception):
        _run_moments(spark, stg, path, ckpt, crash_hook=hook)
    _run_moments(spark, stg, path, ckpt)
    assert read_table(spark, path).collect()[0]["n"] == 150  # not 200


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_category_count_stream_survives_random_crash_chains(spark):
    """Same chain property as the CMS/histogram streams: random batch
    chains with a crash injected at a random trigger boundary must
    still converge to the one-pass batch group-by exactly (the
    watermark guard absorbs post-publish replays; pre-crashes simply
    retry)."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _batch = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=5)
    _crash = st.sampled_from([None, "pre", "post_publish"])
    _chain = st.lists(st.tuples(_batch, _crash), min_size=1, max_size=3)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(chain=_chain)
    def prop(chain):
        work = tempfile.mkdtemp(prefix="cat_crash_chain_")
        try:
            stg = f"{work}/events"
            for batch, _ in chain:
                spark.createDataFrame(
                    [(c,) for c in batch], "event_type string"
                ).coalesce(1).write.mode("append").parquet(stg)
                time.sleep(0.05)

            crash_plan = {i: c for i, (_, c) in enumerate(chain) if c}
            fired = set()

            def hook(batch_id, phase):
                if crash_plan.get(batch_id) == phase and batch_id not in fired:
                    fired.add(batch_id)
                    raise RuntimeError(f"batch {batch_id} died {phase}")

            def run_once():
                stream = (
                    spark.readStream.schema("event_type string")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(stg)
                )
                q = category_count_stream(
                    stream,
                    f"{work}/counts",
                    checkpoint_dir=f"{work}/ckpt",
                    cat_col="event_type",
                    crash_hook=hook,
                )
                try:
                    q.awaitTermination(120)
                    return True
                except Exception:
                    q.stop()
                    return False

            attempts = 0
            while not run_once():
                attempts += 1
                assert attempts <= len(crash_plan) + 1, "failed more than injected"
            assert fired == set(crash_plan)

            got = {
                r["category"]: r["n"]
                for r in read_table(spark, f"{work}/counts").collect()
            }
            want = {}
            for batch, _ in chain:
                for c in batch:
                    want[c] = want.get(c, 0) + 1
            assert got == want
        finally:
            shutil.rmtree(work, ignore_errors=True)

    prop()
