"""Streaming KMV sketch maintenance (streaming/sketch_stream.py):
stream-maintained sketch tables must equal the one-pass batch sketch
EXACTLY (same bottom-k arrays — the merge property, not estimate
similarity), and crashes in the publish-to-checkpoint window must
recover through merge idempotence alone."""

import time

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.sketches import kmv_estimate, kmv_sketch
from implementing_scds_in_hive_spark.streaming.sketch_stream import kmv_sketch_stream
from implementing_scds_in_hive_spark.sources.snapshot import read_table


BATCHES = [
    [(d, u) for d in ("d1", "d2") for u in range(d2 * 40, d2 * 40 + 120)]
    for d2 in range(3)
]


def _write_batches(spark, stg):
    for chunk in BATCHES:
        spark.createDataFrame(chunk, "day string, user_id long").coalesce(1).write.mode(
            "append"
        ).parquet(stg)
        time.sleep(0.05)


def _run(spark, stg, sketch_path, ckpt, crash_hook=None):
    stream = (
        spark.readStream.schema("day string, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stg)
    )
    q = kmv_sketch_stream(
        stream,
        sketch_path,
        checkpoint_dir=ckpt,
        group_cols=["day"],
        value_col="user_id",
        k=64,
        crash_hook=crash_hook,
    )
    q.awaitTermination(120)


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    sketch_path = str(tmp_path / "sketch")
    _run(spark, stg, sketch_path, str(tmp_path / "ckpt"))

    streamed = {r.day: r.kmv for r in read_table(spark, sketch_path).collect()}
    all_events = spark.createDataFrame(
        [r for chunk in BATCHES for r in chunk], "day string, user_id long"
    )
    direct = {r.day: r.kmv for r in kmv_sketch(all_events, ["day"], "user_id", k=64).collect()}
    assert streamed == direct  # exact array equality, not estimate proximity

    est = {
        r.day: r.est_distinct
        for r in kmv_estimate(read_table(spark, sketch_path), ["day"], k=64).collect()
    }
    # 3 batches x 120 users per day with 40-user overlap between
    # consecutive batches -> 200 distinct per day; k=64 < 200 so the
    # estimator path runs; just sanity-bound it
    assert all(100 < v < 400 for v in est.values())


def test_crash_after_publish_recovers_via_merge_idempotence(spark, tmp_path):
    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    sketch_path = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    crashed = {"done": False}

    def hook(batch_id, phase):
        # die once, mid-stream, AFTER the sketch table was replaced but
        # BEFORE the checkpoint commits — the replay window
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash post-publish")

    with pytest.raises(Exception):
        _run(spark, stg, sketch_path, ckpt, crash_hook=hook)
    # restart with the same checkpoint: batch 1 replays (its hashes are
    # already in the table — merge must absorb them), batch 2 proceeds
    _run(spark, stg, sketch_path, ckpt)

    streamed = {r.day: r.kmv for r in read_table(spark, sketch_path).collect()}
    all_events = spark.createDataFrame(
        [r for chunk in BATCHES for r in chunk], "day string, user_id long"
    )
    direct = {r.day: r.kmv for r in kmv_sketch(all_events, ["day"], "user_id", k=64).collect()}
    assert streamed == direct  # crash-free and crashed runs converge identically


def test_histogram_stream_equals_batch_and_guards_replay(spark, tmp_path):
    # additive state: the watermark guard must make a post-publish crash
    # replay a no-op — without it the replayed batch double-counts
    from implementing_scds_in_hive_spark.operators.sketches import binned_histogram
    from implementing_scds_in_hive_spark.streaming.sketch_stream import histogram_stream

    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    hist_path = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(group_cols=["day"], value_col="user_id", lo=0.0, hi=300.0, num_bins=30)

    crashed = {"done": False}

    def hook(batch_id, phase):
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash post-publish")

    def run(crash_hook=None):
        stream = (
            spark.readStream.schema("day string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(stg)
        )
        q = histogram_stream(
            stream, hist_path, checkpoint_dir=ckpt, crash_hook=crash_hook, **kw
        )
        q.awaitTermination(120)

    with pytest.raises(Exception):
        run(crash_hook=hook)
    run()  # restart: batch 1 replays against its own published counts

    got = sorted(
        map(
            tuple,
            read_table(spark, hist_path).select("day", "bucket", "cnt").collect(),
        )
    )
    all_events = spark.createDataFrame(
        [r for chunk in BATCHES for r in chunk], "day string, user_id long"
    )
    want = sorted(
        map(
            tuple,
            binned_histogram(
                all_events, ["day"], "user_id", lo=0.0, hi=300.0, num_bins=30
            ).collect(),
        )
    )
    assert got == want  # no double-count despite the replayed batch


def test_bloom_seen_stream_classifies_and_recovers(spark, tmp_path):
    # cross-batch redelivery detection with bounded state, plus a
    # post-publish crash: replay must re-probe against the PRE-batch
    # filter version (kept alongside the new one) and converge
    from implementing_scds_in_hive_spark.streaming.sketch_stream import bloom_seen_stream

    b0 = [(i,) for i in range(100)]
    b1 = [(i,) for i in range(80, 160)]       # 80..99 are redeliveries
    b2 = [(i,) for i in range(150, 200)]      # 150..159 redeliveries
    stg = str(tmp_path / "keys")
    for chunk in (b0, b1, b2):
        spark.createDataFrame(chunk, "k long").coalesce(1).write.mode("append").parquet(stg)
        time.sleep(0.05)

    bloom_path, out_path = str(tmp_path / "bloom"), str(tmp_path / "seen")

    def run(ckpt, crash_hook=None):
        stream = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", "1")
            .parquet(stg)
        )
        q = bloom_seen_stream(
            stream,
            bloom_path,
            out_path,
            checkpoint_dir=ckpt,
            key_col="k",
            num_bits=1 << 14,
            crash_hook=crash_hook,
        )
        q.awaitTermination(120)

    crashed = {"done": False}

    def hook(batch_id, phase):
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash post-publish")

    with pytest.raises(Exception):
        run(str(tmp_path / "ckpt"), crash_hook=hook)
    run(str(tmp_path / "ckpt"))  # same checkpoint: batch 1 replays

    rows = read_table(spark, out_path).collect()
    # first-seen side is GUARANTEED correct (no false negatives):
    # every key marked seen_before must actually be a redelivery
    first_batch = {r.k for r in rows if r.batch_id == 0}
    assert not any(r.seen_before for r in rows if r.batch_id == 0)
    seen_flags = {(r.batch_id, r.k): r.seen_before for r in rows}
    for k in range(80, 100):
        assert seen_flags[(1, k)] is True     # redelivered from batch 0
    for k in range(150, 160):
        assert seen_flags[(2, k)] is True     # redelivered from batch 1
    # fresh keys flip to seen only at the documented FPR (~0 at this fill)
    fresh_flagged = [
        (b, k) for (b, k), s in seen_flags.items() if s and not (
            (b == 1 and 80 <= k < 100) or (b == 2 and 150 <= k < 160)
        )
    ]
    assert len(fresh_flagged) <= 2  # tiny filter, tiny FPR budget
    assert len(rows) == 230


def test_cms_stream_equals_batch_and_guards_replay(spark, tmp_path):
    # additive counters, same recovery class as histogram_stream: the
    # watermark guard must absorb a post-publish crash replay, and the
    # final table must equal the one-pass batch sketch exactly.
    from implementing_scds_in_hive_spark.operators.sketches import cms_sketch
    from implementing_scds_in_hive_spark.streaming.sketch_stream import cms_stream

    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    cms_path = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(group_cols=["day"], value_col="user_id", depth=4, width=256)

    crashed = {"done": False}

    def hook(batch_id, phase):
        if phase == "post_publish" and batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash post-publish")

    def run(crash_hook=None):
        stream = (
            spark.readStream.schema("day string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(stg)
        )
        q = cms_stream(
            stream, cms_path, checkpoint_dir=ckpt, crash_hook=crash_hook, **kw
        )
        q.awaitTermination(120)

    with pytest.raises(Exception):
        run(crash_hook=hook)
    run()  # restart: batch 1 replays against its own published counters

    got = sorted(
        map(
            tuple,
            read_table(spark, cms_path).select("day", "row", "col", "cnt").collect(),
        )
    )
    all_events = spark.createDataFrame(
        [r for chunk in BATCHES for r in chunk], "day string, user_id long"
    )
    want = sorted(
        map(tuple, cms_sketch(all_events, ["day"], "user_id", depth=4, width=256).collect())
    )
    assert got == want  # no double-count despite the replayed batch


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_cms_stream_survives_random_crash_chains(spark):
    # the watermark-guard analog of the scd upsert's chain property:
    # random batch chains with a crash injected at a random trigger
    # boundary (before work, or post-publish in the replay window) must
    # still converge to the one-pass batch sketch exactly. Fewer
    # examples than the scd chain test — each example spins up real
    # streaming queries — but the same shape.
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from implementing_scds_in_hive_spark.operators.sketches import cms_sketch
    from implementing_scds_in_hive_spark.streaming.sketch_stream import cms_stream

    _batch = st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=5)
    _crash = st.sampled_from([None, "pre", "post_publish"])
    _chain = st.lists(st.tuples(_batch, _crash), min_size=1, max_size=3)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(chain=_chain)
    def prop(chain):
        work = tempfile.mkdtemp(prefix="cms_crash_chain_")
        try:
            stg = f"{work}/events"
            for batch, _ in chain:
                spark.createDataFrame(
                    [("g", v) for v in batch], "g string, v long"
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
                    spark.readStream.schema("g string, v long")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(stg)
                )
                q = cms_stream(
                    stream,
                    f"{work}/cms",
                    checkpoint_dir=f"{work}/ckpt",
                    group_cols=["g"],
                    value_col="v",
                    depth=4,
                    width=64,
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

            got = sorted(
                map(
                    tuple,
                    read_table(spark, f"{work}/cms")
                    .select("g", "row", "col", "cnt")
                    .collect(),
                )
            )
            all_events = spark.createDataFrame(
                [("g", v) for batch, _ in chain for v in batch], "g string, v long"
            )
            want = sorted(
                map(
                    tuple,
                    cms_sketch(all_events, ["g"], "v", depth=4, width=64).collect(),
                )
            )
            assert got == want
        finally:
            shutil.rmtree(work, ignore_errors=True)

    prop()


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_histogram_stream_survives_random_crash_chains(spark):
    # same chain property for the OTHER additive stream: the guard
    # logic lives separately in histogram_stream, so the CMS chain test
    # would not catch drift here.
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from implementing_scds_in_hive_spark.operators.sketches import binned_histogram
    from implementing_scds_in_hive_spark.streaming.sketch_stream import histogram_stream

    _batch = st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=5)
    _crash = st.sampled_from([None, "pre", "post_publish"])
    _chain = st.lists(st.tuples(_batch, _crash), min_size=1, max_size=3)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(chain=_chain)
    def prop(chain):
        work = tempfile.mkdtemp(prefix="hist_crash_chain_")
        try:
            stg = f"{work}/events"
            for batch, _ in chain:
                spark.createDataFrame(
                    [("g", v) for v in batch], "g string, v long"
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
                    spark.readStream.schema("g string, v long")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(stg)
                )
                q = histogram_stream(
                    stream,
                    f"{work}/hist",
                    checkpoint_dir=f"{work}/ckpt",
                    group_cols=["g"],
                    value_col="v",
                    lo=0.0,
                    hi=100.0,
                    num_bins=10,
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

            got = sorted(
                map(
                    tuple,
                    read_table(spark, f"{work}/hist")
                    .select("g", "bucket", "cnt")
                    .collect(),
                )
            )
            all_events = spark.createDataFrame(
                [("g", v) for batch, _ in chain for v in batch], "g string, v long"
            )
            want = sorted(
                map(
                    tuple,
                    binned_histogram(
                        all_events, ["g"], "v", lo=0.0, hi=100.0, num_bins=10
                    ).collect(),
                )
            )
            assert got == want
        finally:
            shutil.rmtree(work, ignore_errors=True)

    prop()

def test_fresh_checkpoint_regression_fails_loudly(spark, tmp_path):
    """r11 streaming review: a restart with a RECREATED checkpoint dir
    resets batch ids to 0 while the state table keeps its watermark —
    silently skipping every batch until the fresh ids catch up would be
    unbounded data loss. The stream must fail loudly instead (and the
    accumulated state must be untouched)."""
    from implementing_scds_in_hive_spark.streaming.sketch_stream import (
        histogram_stream,
    )

    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    hist_path = str(tmp_path / "hist")
    kw = dict(group_cols=["day"], value_col="user_id", lo=0.0, hi=300.0, num_bins=30)

    def run(ckpt, src):
        stream = (
            spark.readStream.schema("day string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = histogram_stream(stream, hist_path, checkpoint_dir=ckpt, **kw)
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"), stg)  # watermark now 2
    before = sorted(map(tuple, read_table(spark, hist_path).collect()))

    stg2 = str(tmp_path / "events2")  # new data, FRESH checkpoint
    spark.createDataFrame(
        [("d1", 7)], "day string, user_id long"
    ).coalesce(1).write.parquet(stg2)
    with pytest.raises(Exception, match="regressed below"):
        run(str(tmp_path / "ckpt2"), stg2)
    after = sorted(map(tuple, read_table(spark, hist_path).collect()))
    assert after == before, "failed restart must not mutate state"


def test_bloom_param_change_refused(spark, tmp_path):
    """OR-merging word maps built under different num_bits breaks the
    no-false-negatives guarantee — a restart with changed parameters
    must refuse, not silently corrupt the filter."""
    from implementing_scds_in_hive_spark.streaming.sketch_stream import (
        bloom_seen_stream,
    )

    stg = str(tmp_path / "keys")
    spark.createDataFrame([(i,) for i in range(50)], "k long").coalesce(
        1
    ).write.parquet(stg)

    def run(ckpt, num_bits):
        stream = spark.readStream.schema("k long").parquet(stg)
        q = bloom_seen_stream(
            stream,
            str(tmp_path / "bloom"),
            out_path=str(tmp_path / "out"),
            checkpoint_dir=ckpt,
            key_col="k",
            num_bits=num_bits,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "c1"), 1 << 16)
    with pytest.raises(Exception, match="num_bits"):
        run(str(tmp_path / "c2"), 1 << 17)


def test_transient_state_read_failure_raises_not_wipes(spark, tmp_path, monkeypatch):
    """r11 streaming review: a transient read error on a non-empty
    state table must FAIL the trigger, not be treated as 'first batch'
    — that would publish the current batch alone over all accumulated
    state."""
    import implementing_scds_in_hive_spark.streaming.sketch_stream as ss

    stg = str(tmp_path / "events")
    _write_batches(spark, stg)
    sketch_path = str(tmp_path / "sketch")
    _run(spark, stg, sketch_path, str(tmp_path / "ckpt1"))
    before = sorted(map(tuple, read_table(spark, sketch_path).collect()))

    def _flaky(*a, **k):
        raise RuntimeError("transient fs hiccup")

    monkeypatch.setattr(ss, "read_table", _flaky)
    stg2 = str(tmp_path / "events2")
    spark.createDataFrame(
        [("d1", 999)], "day string, user_id long"
    ).coalesce(1).write.parquet(stg2)
    with pytest.raises(Exception, match="transient fs hiccup"):
        _run(spark, stg2, sketch_path, str(tmp_path / "ckpt2"))
    monkeypatch.undo()
    after = sorted(map(tuple, read_table(spark, sketch_path).collect()))
    assert after == before, "failed read must not wipe accumulated state"


def test_bloom_stream_tolerates_zero_row_state_table(spark, tmp_path):
    """r12 (ADVICE): a bloom state table that EXISTS but holds zero
    rows (retention/vacuum edge, or a manually truncated table) must
    fall through to the first-batch path — the r11 head-row collect
    raised IndexError there."""
    from implementing_scds_in_hive_spark.operators.scd import publish
    from implementing_scds_in_hive_spark.streaming.sketch_stream import (
        bloom_seen_stream,
    )

    bloom_path = str(tmp_path / "bloom")
    out_path = str(tmp_path / "seen")
    stg = str(tmp_path / "keys")
    spark.createDataFrame([(i,) for i in range(50)], "k long").coalesce(
        1
    ).write.parquet(stg)

    # publish a ZERO-ROW state table with the bloom version schema
    empty = spark.createDataFrame(
        [],
        "bloom_words map<int,long>, num_bits int, num_hashes int, batch_id long",
    )
    publish(empty, bloom_path, retain_versions=2)

    stream = spark.readStream.schema("k long").parquet(stg)
    q = bloom_seen_stream(
        stream,
        bloom_path,
        out_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        key_col="k",
        num_bits=1 << 14,
    )
    q.awaitTermination(120)

    rows = read_table(spark, out_path).collect()
    assert len(rows) == 50
    # with no usable prior filter, everything is first-seen
    assert not any(r.seen_before for r in rows)
    # and the fold still produced a filter version for the NEXT batch
    state = read_table(spark, bloom_path)
    assert state.count() >= 1


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_bloom_stream_survives_crash_sweep(spark, tmp_path):
    """r12 kill-and-resume sweep (VERDICT r11 next-round #4): one
    injected death at every (batch, phase) point of bloom_seen_stream's
    commit protocol — before any work, after the classified output
    lands, and after the filter publish but before the checkpoint —
    each followed by a restart from the same checkpoint. The final
    classified output and the filter's no-false-negative guarantee must
    match the crash-free run exactly."""
    from implementing_scds_in_hive_spark.streaming.sketch_stream import (
        bloom_seen_stream,
    )

    batches = [
        [(i,) for i in range(60)],
        [(i,) for i in range(40, 110)],   # 40..59 redelivered
        [(i,) for i in range(100, 150)],  # 100..109 redelivered
    ]

    def feed(stg):
        for chunk in batches:
            spark.createDataFrame(chunk, "k long").coalesce(1).write.mode(
                "append"
            ).parquet(stg)
            time.sleep(0.05)

    def run(tag, crash_hook=None, ckpt=None):
        stream = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / f"stg_{tag}"))
        )
        q = bloom_seen_stream(
            stream,
            str(tmp_path / f"bloom_{tag}"),
            str(tmp_path / f"seen_{tag}"),
            checkpoint_dir=ckpt or str(tmp_path / f"ckpt_{tag}"),
            key_col="k",
            num_bits=1 << 14,
            crash_hook=crash_hook,
        )
        q.awaitTermination(180)

    def seen_flags(tag):
        return sorted(
            (r.batch_id, r.k, r.seen_before)
            for r in read_table(spark, str(tmp_path / f"seen_{tag}")).collect()
        )

    feed(str(tmp_path / "stg_base"))
    run("base")
    baseline = seen_flags("base")

    for b in range(len(batches)):
        for phase in ("pre", "post_output", "post_publish"):
            tag = f"{b}_{phase}"
            feed(str(tmp_path / f"stg_{tag}"))
            fired = {"done": False}

            def hook(batch_id, ph, _b=b, _phase=phase, _fired=fired):
                if batch_id == _b and ph == _phase and not _fired["done"]:
                    _fired["done"] = True
                    raise RuntimeError(f"injected death at {_b}/{_phase}")

            with pytest.raises(Exception):
                run(tag, crash_hook=hook)
            assert fired["done"], f"crash at {tag} never fired"
            run(tag)  # restart from the same checkpoint
            assert seen_flags(tag) == baseline, (
                f"classification diverged after crash at {tag}"
            )
