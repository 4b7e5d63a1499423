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
