"""Durable winnow-span index (r14): the exact-substring tier's stored
lifecycle — save → fresh-session load → incremental cross-side probe →
append → probe sees appended docs. The probe's contract is EQUALITY
with the batch operator's cross pairs on the combined corpus (the same
losslessness-by-construction bar as the minhash stored probe)."""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    exact_substring_spans,
    winnow_span_index,
)
from implementing_scds_in_hive_spark.operators.index_store import (
    append_winnow_index,
    incremental_exact_substring_spans_stored,
    load_winnow_index,
    save_winnow_index,
)

MIN_LEN, K = 12, 8


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def winnow_setup(spark, sf_dir, tmp_path):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = d.where(F.col("doc_id") % 4 != 0)
    delta = (
        d.where(F.col("doc_id") % 4 == 0)
        .limit(60)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
        .unionByName(
            # planted clones of corpus docs: guaranteed cross-side spans
            corpus.where(F.col("doc_id") % 30 == 1)
            .limit(10)
            .withColumn("doc_id", F.col("doc_id") + 900_000)
        )
        .localCheckpoint(eager=True)
    )
    root = str(tmp_path / "wn_index")
    save_winnow_index(
        winnow_span_index(corpus, min_len=MIN_LEN, k=K),
        "t_wn", root, n_buckets=16,
        params={"min_len": MIN_LEN, "k": K},
    )
    yield corpus, delta, root
    _drop(spark, "t_wn_docs", "t_wn_fps")


def test_stored_probe_equals_batch_cross_pairs_fresh_session(spark, winnow_setup):
    corpus, delta, root = winnow_setup
    both = corpus.unionByName(delta)
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    expected = sorted(
        t
        for t in map(
            tuple, exact_substring_spans(both, min_len=MIN_LEN, k=K).collect()
        )
        if t[0] in corpus_ids and t[1] in delta_ids
    )
    assert expected, "fixture must produce cross-side spans"

    # restart simulation: catalog forgets, files + sidecar stay
    _drop(spark, "t_wn_docs", "t_wn_fps")
    fresh = spark.newSession()
    got = sorted(
        map(
            tuple,
            incremental_exact_substring_spans_stored(
                fresh, root, winnow_span_index(delta, min_len=MIN_LEN, k=K)
            ).collect(),
        )
    )
    assert got == expected


def test_append_extends_candidate_reach(spark, winnow_setup):
    """After folding delta 1 into the index, a delta 2 that clones a
    DELTA-1 document finds it through the index alone."""
    _, delta, root = winnow_setup
    append_winnow_index(
        spark, root, winnow_span_index(delta, min_len=MIN_LEN, k=K)
    )
    d2 = (
        delta.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 5_000_000)
        .localCheckpoint(eager=True)
    )
    got = incremental_exact_substring_spans_stored(
        spark, root, winnow_span_index(d2, min_len=MIN_LEN, k=K)
    ).collect()
    delta1_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    assert any(r["id_a"] in delta1_ids for r in got), (
        "appended delta-1 docs invisible to the stored probe"
    )
    # full-length self-clone spans: the d2 docs are exact copies
    assert all(r["span_len"] >= MIN_LEN for r in got)


def test_probe_requires_recorded_params(spark, tmp_path, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
        .limit(40)
    )
    root = str(tmp_path / "wn_noparams")
    save_winnow_index(
        winnow_span_index(d, min_len=MIN_LEN, k=K), "t_wn_np", root,
        n_buckets=4, params={},
    )
    try:
        with pytest.raises(ValueError, match="lacks \\(min_len, k\\)"):
            incremental_exact_substring_spans_stored(
                spark, root, winnow_span_index(d, min_len=MIN_LEN, k=K)
            )
    finally:
        _drop(spark, "t_wn_np_docs", "t_wn_np_fps")


def test_load_rejects_kind_mismatch(spark, winnow_setup):
    _, _, root = winnow_setup
    from implementing_scds_in_hive_spark.operators.index_store import (
        load_ivf_index,
    )

    with pytest.raises(ValueError, match="not ivf"):
        load_ivf_index(spark, root)
    docs, fps, params = load_winnow_index(spark.newSession(), root)
    assert set(docs.columns) == {"did", "ws"}
    assert set(fps.columns) == {"fp", "did"}
    assert params == {"min_len": MIN_LEN, "k": K}


def _wait(q, timeout=240):
    q.awaitTermination(timeout)
    assert not q.isActive


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_substring_stream_dedups_across_batches_and_replays_cleanly(
    spark, sf_dir, tmp_path
):
    """Streaming face: batch 1's copy of batch 0's passage is found
    through the INDEX alone (per-batch dedup cannot see it), and an
    injected death in the post_spans window — spans published, index
    not yet appended — replays to the byte-identical final state."""
    from implementing_scds_in_hive_spark.streaming.dedup_stream import (
        substring_dedup_stream,
    )

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = d.where(F.col("doc_id") < 300)
    base = {
        r["doc_id"]: r["text"]
        for r in corpus.where("doc_id in (5, 7)").collect()
    }
    x_text = " ".join(f"streamtok{i}" for i in range(30))
    b0 = [
        (100_005, base[5]),                      # cross span vs corpus doc 5
        (200_001, x_text), (200_002, x_text),    # intra-batch pair
    ]
    b1 = [(400_001, x_text + " zz tail")]        # copy of batch-0 doc: index-only

    def stage(tag):
        stg = str(tmp_path / f"docs_{tag}")
        import time as _t

        for chunk in (b0, b1):
            spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
                1
            ).write.mode("append").parquet(stg)
            _t.sleep(0.05)
        return stg

    def build_index(tag):
        root = str(tmp_path / f"wn_{tag}")
        save_winnow_index(
            winnow_span_index(corpus, min_len=MIN_LEN, k=K),
            f"t_swn_{tag}", root, n_buckets=8,
            params={"min_len": MIN_LEN, "k": K},
        )
        return root

    def spans_set(path):
        return {
            (r["batch_id"], r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
            for r in spark.read.parquet(path).collect()
        }

    # --- crash-free run ----------------------------------------------
    root = build_index("a")
    spans_path = str(tmp_path / "spans_a")
    q = substring_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage("a")),
        root, spans_path, checkpoint_dir=str(tmp_path / "ckpt_a"),
    )
    _wait(q)
    got = spans_set(spans_path)
    _drop(spark, "t_swn_a_docs", "t_swn_a_fps")
    assert any(r[1] == 5 and r[2] == 100_005 for r in got), "cross span missing"
    assert any(r[1] == 200_001 and r[2] == 200_002 for r in got), "intra span missing"
    assert any(
        r[0] == 1 and r[1] in (200_001, 200_002) and r[2] == 400_001 for r in got
    ), "batch-1 copy of batch-0 doc not found through the index"

    # --- injected death in the replay window -------------------------
    root_b = build_index("b")
    spans_b = str(tmp_path / "spans_b")
    fired = {"done": False}

    def hook(batch_id, phase):
        if batch_id == 0 and phase == "post_spans" and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected death post_spans")

    qb = substring_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage("b")),
        root_b, spans_b, checkpoint_dir=str(tmp_path / "ckpt_b"),
        crash_hook=hook,
    )
    try:
        qb.awaitTermination(240)
    except Exception:
        pass  # the injected death surfaces through the query
    assert fired["done"]
    # restart: same checkpoint replays batch 0, then batch 1
    qb2 = substring_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "docs_b")),
        root_b, spans_b, checkpoint_dir=str(tmp_path / "ckpt_b"),
    )
    _wait(qb2)
    got_b = spans_set(spans_b)
    _drop(spark, "t_swn_b_docs", "t_swn_b_fps")
    # byte-identical to the crash-free run modulo the independent ids
    assert got_b == got, (
        f"replay diverged: only-crash={sorted(got_b - got)[:3]} "
        f"only-clean={sorted(got - got_b)[:3]}"
    )
