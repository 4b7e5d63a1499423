"""KNN self-join semantics (operators/similarity.py knn_join /
knn_join_ivf). The sign-bit variant's bucket-restricted ranking is
value-hash-checked against DuckDB in test_pytest_only_oracles; here:
planted-duplicate behavior, exactness when the probe covers every cell,
the pre-assigned-index path, and the nprobe recall dial."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.similarity import (
    ivf_assign,
    knn_join,
    knn_join_ivf,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    # planted exact duplicate pair: 100 copies 3
    rows.append((100, rows[3][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _exact_knn(rows, k):
    """numpy reference: per vector, top-k by (round(cos,6) desc, id asc)."""
    ids = [r[0] for r in rows]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = n @ n.T
    out = {}
    for i, vid in enumerate(ids):
        cand = [
            (round(float(sims[i, j]), 6), ids[j])
            for j in range(len(ids))
            if ids[j] != vid
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[vid] = [c[1] for c in cand[:k]]
    return out


def test_planted_duplicate_is_rank1_both_ways(vecs):
    got = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in knn_join(vecs, k=2, n_bits=4).collect()
    }
    assert got[(3, 1)] == (100, 1.0)
    assert got[(100, 1)] == (3, 1.0)


def test_at_most_k_neighbors_per_vector(vecs):
    counts = (
        knn_join(vecs, k=3, n_bits=4)
        .groupBy("vec_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert counts <= 3


def test_ivf_full_probe_is_exact(spark, vecs):
    # probing every cell makes the candidate set the whole corpus:
    # results must equal the numpy exact KNN, ties and all
    cents = vecs.where(F.col("vec_id").isin([0, 10, 20, 30])).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    got = knn_join_ivf(vecs, cents, k=3, nprobe=4).collect()
    by_vec = {}
    for r in sorted(got, key=lambda r: (r.vec_id, r.rank)):
        by_vec.setdefault(r.vec_id, []).append(r.neighbor_id)
    exact = _exact_knn([(r.vec_id, r.embedding) for r in vecs.collect()], 3)
    assert by_vec == exact


def test_preassigned_corpus_matches_on_the_fly(spark, vecs):
    cents = vecs.where(F.col("vec_id").isin([0, 10, 20, 30])).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(vecs, cents)
    a = sorted(map(tuple, knn_join_ivf(assigned, cents, k=3, nprobe=2).collect()))
    b = sorted(map(tuple, knn_join_ivf(vecs, cents, k=3, nprobe=2).collect()))
    assert a == b


def test_nprobe_recall_monotone(spark, vecs):
    cents = vecs.where(F.col("vec_id").isin([0, 10, 20, 30])).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    exact = _exact_knn([(r.vec_id, r.embedding) for r in vecs.collect()], 3)
    truth = {(v, n) for v, ns in exact.items() for n in ns}

    def recall(nprobe):
        got = {
            (r.vec_id, r.neighbor_id)
            for r in knn_join_ivf(vecs, cents, k=3, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4 == 1.0
    assert r1 > 0.3  # single-probe must still find a meaningful fraction


# --- quantized storage tier ----------------------------------------------

def test_quantized_rescore_full_shortlist_is_exact(spark, vecs):
    from implementing_scds_in_hive_spark.operators.similarity import (
        cosine_topk,
        quantize_corpus,
        quantized_rescore_topk,
    )

    queries = vecs.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cq = quantize_corpus(vecs)
    got = sorted(
        map(
            tuple,
            quantized_rescore_topk(cq, vecs, queries, k=5, shortlist=10_000).collect(),
        )
    )
    want = sorted(map(tuple, cosine_topk(vecs, queries, k=5).collect()))
    assert got == want  # shortlist >= |corpus| degrades to exact brute force


def test_quantized_rescore_default_margin_recall(spark, vecs):
    from implementing_scds_in_hive_spark.operators.similarity import (
        cosine_topk,
        quantize_corpus,
        quantized_rescore_topk,
    )

    queries = vecs.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cq = quantize_corpus(vecs)
    got = {
        (r.query_id, r.vec_id)
        for r in quantized_rescore_topk(cq, vecs, queries, k=5).collect()
    }
    truth = {(r.query_id, r.vec_id) for r in cosine_topk(vecs, queries, k=5).collect()}
    assert len(got & truth) / len(truth) >= 0.95  # 4k coarse margin recall


def test_quantized_corpus_parquet_is_smaller(spark, tmp_path):
    # needs enough data that row-group payload dwarfs file metadata
    from implementing_scds_in_hive_spark.operators.similarity import quantize_corpus

    rng = np.random.default_rng(3)
    big = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=64)]) for i in range(5000)],
        "vec_id long, embedding array<float>",
    )
    full_p, q_p = str(tmp_path / "full"), str(tmp_path / "quant")
    big.coalesce(1).write.parquet(full_p)
    quantize_corpus(big).coalesce(1).write.parquet(q_p)
    import os

    def size(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    ratio = size(full_p) / size(q_p)
    assert ratio > 2.0, f"quantized tier only {ratio:.2f}x smaller"
