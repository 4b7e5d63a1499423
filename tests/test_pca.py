"""PCA (operators/pca.py): the distributed moment pass must equal
numpy on the collected data exactly (same algebra, different
partitioning), the fitted model must satisfy the spectral invariants
(orthonormal components, descending variance, score variance ==
eigenvalue), and the transform must beat the data-oblivious JL tier on
captured variance at equal output dims — the reason a trained
projection exists."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.pca import (
    covariance_moments,
    pca_fit,
    pca_transform,
)

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])


def test_moments_match_numpy(emb, X):
    n, mean, cov = covariance_moments(emb, dim=DIM)
    assert n == X.shape[0]
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(cov, np.cov(X.T, bias=True), rtol=1e-9, atol=1e-12)


def test_moments_deterministic_across_runs(emb):
    _, m1, c1 = covariance_moments(emb, dim=DIM)
    _, m2, c2 = covariance_moments(emb, dim=DIM)
    assert (m1 == m2).all() and (c1 == c2).all()


def test_model_spectral_invariants(spark, emb, X):
    k = 8
    model = pca_fit(emb, k, dim=DIM)
    W = np.array(model.components)
    np.testing.assert_allclose(W @ W.T, np.eye(k), atol=1e-10)  # orthonormal
    ev = np.array(model.explained_variance)
    assert (ev[:-1] >= ev[1:] - 1e-12).all()  # descending
    assert 0 < sum(model.explained_ratio) <= 1 + 1e-9
    # per-component score variance equals its eigenvalue
    scores = pca_transform(emb, model)
    S = np.stack(
        [np.array(r["scores"]) for r in scores.orderBy("vec_id").collect()]
    )
    np.testing.assert_allclose(S.var(axis=0), ev, rtol=1e-6)
    # and matches the numpy projection exactly up to float noise
    Xc = X - X.mean(axis=0)
    np.testing.assert_allclose(S, Xc @ W.T, atol=1e-9)


def test_pca_beats_jl_on_reconstruction(spark, emb, X):
    """The reason to pay the training pass: at equal k the trained
    projection must reconstruct the corpus with lower error than the
    data-oblivious Rademacher projection. (Variance-sum is NOT the
    right metric — JL approximately preserves total variance by
    design; what it cannot do is CONCENTRATE it, which is what
    reconstruction measures. Best-linear JL reconstruction via least
    squares, so the comparison is fair.) Measured on this corpus:
    0.797 vs 0.866 at k=8; assert PCA wins at both tested k."""
    from implementing_scds_in_hive_spark.operators.similarity import rp_project_corpus

    Xc = X - X.mean(axis=0)
    total = (Xc ** 2).sum()
    for k in (8, 16):
        model = pca_fit(emb, k, dim=DIM)
        W = np.array(model.components)
        pca_err = 1 - ((Xc @ W.T) ** 2).sum() / total
        R = np.stack(
            [np.array(r["rvec"]) for r in rp_project_corpus(
                emb, dim_in=DIM, dim_out=k
            ).orderBy("vec_id").collect()]
        )
        Rc = R - R.mean(axis=0)
        B, *_ = np.linalg.lstsq(Rc, Xc, rcond=None)
        jl_err = ((Xc - Rc @ B) ** 2).sum() / total
        assert pca_err < jl_err - 0.02, (k, pca_err, jl_err)


def test_transform_plan_is_jvm_literal_dots(spark, emb):
    model = pca_fit(emb, 4, dim=DIM)
    plan = pca_transform(emb, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transform_methods_agree_and_auto_picks_arrow_past_codegen_limit(spark, emb):
    """The literal path loses whole-stage codegen past ~512 terms
    (Janino 64 KB) — auto must switch to the Arrow/BLAS path there, and
    the two strategies may differ only in float summation order."""
    from implementing_scds_in_hive_spark.operators.pca import pca_transform

    m16 = pca_fit(emb, 16, dim=DIM)  # 16*64 = 1024 terms > 512
    lit = np.stack([np.array(r["scores"]) for r in pca_transform(
        emb, m16, method="literal").orderBy("vec_id").collect()])
    arr = np.stack([np.array(r["scores"]) for r in pca_transform(
        emb, m16, method="arrow").orderBy("vec_id").collect()])
    auto = np.stack([np.array(r["scores"]) for r in pca_transform(
        emb, m16).orderBy("vec_id").collect()])
    np.testing.assert_allclose(lit, arr, rtol=1e-10, atol=1e-12)
    assert (auto == arr).all()  # auto routed to arrow, bit-identical
    m4 = pca_fit(emb, 4, dim=DIM)  # 256 terms: stays literal
    lit4 = pca_transform(emb, m4, method="literal")
    auto4 = pca_transform(emb, m4)
    assert lit4.schema == auto4.schema
    a, b = (np.stack([np.array(r["scores"]) for r in d.orderBy("vec_id").collect()])
            for d in (lit4, auto4))
    assert (a == b).all()


def test_pca_ann_tier(spark, emb):
    """The trained two-stage tier: exact at full shortlist, better
    coarse recall than JL at equal dims (0.76 vs 0.59 measured at
    16 dims / shortlist 40 — assert the ordering with margin), and the
    prebuilt-projection path gives identical answers."""
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.similarity import (
        cosine_topk,
        pca_project_corpus,
        pca_rescore_topk,
        rp_rescore_topk,
    )

    q = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = pca_fit(emb, 16, dim=DIM)
    n = emb.count()
    exact = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    via_pca_full = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
        for r in pca_rescore_topk(emb, q, model, k=5, shortlist=n).collect()
    }
    assert via_pca_full == exact

    exact5 = {(qid, vid) for (qid, _), (vid, _) in exact.items()}
    def recall(df):
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(exact5 & got) / len(exact5)

    r_pca = recall(pca_rescore_topk(emb, q, model, k=5, shortlist=40))
    r_jl = recall(rp_rescore_topk(emb, q, k=5, shortlist=40))
    assert r_pca >= r_jl + 0.05, (r_pca, r_jl)

    cp = pca_project_corpus(emb, model).persist()
    cp.count()
    a = sorted(map(tuple, pca_rescore_topk(emb, q, model, k=3, shortlist=12).collect()))
    b = sorted(map(tuple, pca_rescore_topk(
        emb, q, model, k=3, shortlist=12, corpus_proj=cp).collect()))
    assert a == b
    cp.unpersist()


def test_whitened_scores_have_unit_variance(spark, emb):
    from implementing_scds_in_hive_spark.operators.pca import pca_transform

    m = pca_fit(emb, 6, dim=DIM)
    S = np.stack([np.array(r["scores"]) for r in pca_transform(
        emb, m, whiten=True).orderBy("vec_id").collect()])
    np.testing.assert_allclose(S.var(axis=0), np.ones(6), rtol=1e-6)
    # whitening folds into the weights: arrow path agrees
    A = np.stack([np.array(r["scores"]) for r in pca_transform(
        emb, m, whiten=True, method="arrow").orderBy("vec_id").collect()])
    np.testing.assert_allclose(S, A, rtol=1e-9, atol=1e-12)


def test_model_roundtrips_bit_identically(spark, emb, tmp_path):
    from implementing_scds_in_hive_spark.operators.pca import (
        load_model,
        pca_transform,
        save_model,
    )

    m = pca_fit(emb, 6, dim=DIM)
    path = str(tmp_path / "model" / "pca.json")
    save_model(m, path)
    m2 = load_model(path)
    assert m2 == m  # frozen dataclass equality: every float identical
    a = pca_transform(emb, m).orderBy("vec_id").collect()
    b = pca_transform(emb, m2).orderBy("vec_id").collect()
    assert [r["scores"] for r in a] == [r["scores"] for r in b]


def test_null_vectors_skipped_not_crashing(spark, emb):
    """A real corpus has null embedding rows; both Arrow paths must
    skip them (moments exclude from n; arrow transform yields null
    scores) instead of dying in np.stack."""
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.pca import (
        covariance_moments,
        pca_transform,
    )

    with_nulls = emb.unionByName(
        spark.createDataFrame(
            [(100001, None), (100002, None)],
            emb.schema,
        )
    )
    n_clean, mean_clean, cov_clean = covariance_moments(emb, dim=DIM)
    n, mean, cov = covariance_moments(with_nulls, dim=DIM)
    assert n == n_clean
    np.testing.assert_allclose(mean, mean_clean, rtol=1e-12)

    m = pca_fit(emb, 16, dim=DIM)
    rows = {
        r["vec_id"]: r["scores"]
        for r in pca_transform(with_nulls, m, method="arrow").collect()
    }
    assert rows[100001] is None and rows[100002] is None
    assert rows[0] is not None and len(rows[0]) == 16

    # ADVICE r5: the literal path must agree — NULL vector -> NULL array,
    # not an array of k NULLs, so method="auto" never changes null
    # semantics when k*d crosses the codegen ceiling.
    lit_rows = {
        r["vec_id"]: r["scores"]
        for r in pca_transform(with_nulls, m, method="literal").collect()
    }
    assert lit_rows[100001] is None and lit_rows[100002] is None
    assert lit_rows[0] is not None and len(lit_rows[0]) == 16
