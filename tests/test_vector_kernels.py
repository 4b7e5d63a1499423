"""Backend-equality and rounding-exactness pins for the r14 Arrow/NumPy
scoring kernels (operators/vector_kernels.py).

The kernels back hash-compared oracle slots, so the contract is strict:
identical ROWS (values bitwise, after the module's 6-decimal rounding)
between ``backend="arrow"`` and ``backend="builtin"`` on every operator
that grew the backend switch, and Spark-exact ``round()`` semantics in
:func:`round_half_up` including the adversarial cases where a naive
``np.round`` diverges (decimal .5 boundaries -> HALF_EVEN vs HALF_UP;
tiny negatives -> -0.0 where BigDecimal has no signed zero).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
)
from implementing_scds_in_hive_spark.operators.vector_kernels import (
    round_half_up,
)


def _corpus(spark, n=400, dim=16, seed=7):
    """Deterministic synthetic embeddings with negative values, repeated
    vectors (rank ties at full precision) and near-tie geometry."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 17 == 0 and i > 0:
            vec = rows[i - 1][1]  # exact duplicate -> guaranteed ties
        else:
            vec = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def corpus(spark):
    return _corpus(spark)


@pytest.fixture(scope="module")
def queries_df(corpus):
    return corpus.where(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def centroids(corpus):
    return corpus.where(F.col("vec_id") % 23 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cosine_topk_backends_identical(corpus, queries_df):
    a = _rows(cosine_topk(corpus, queries_df, k=7, backend="arrow"))
    b = _rows(cosine_topk(corpus, queries_df, k=7, backend="builtin"))
    assert a == b
    assert len(a) == queries_df.count() * 7


def test_ivf_assign_backends_identical(corpus, centroids):
    a = _rows(
        ivf_assign(corpus, centroids, backend="arrow").select(
            "vec_id", "centroid_id"
        )
    )
    b = _rows(
        ivf_assign(corpus, centroids, backend="builtin").select(
            "vec_id", "centroid_id"
        )
    )
    assert a == b


def test_ivf_assign_arrow_preserves_vectors(corpus, centroids):
    """The pass-through embedding column must round-trip the Arrow
    boundary bit-exactly (downstream k-means means consume it)."""
    back = dict(
        ivf_assign(corpus, centroids, backend="arrow")
        .select("vec_id", "embedding")
        .collect()
    )
    for vid, vec in corpus.collect():
        assert list(back[vid]) == list(vec)


@pytest.mark.parametrize("prune", [False, True])
def test_ivf_topk_backends_identical(corpus, queries_df, centroids, prune):
    a = _rows(
        ivf_topk(
            corpus, queries_df, centroids, k=5, nprobe=2,
            probe_prune=prune, backend="arrow",
        )
    )
    b = _rows(
        ivf_topk(
            corpus, queries_df, centroids, k=5, nprobe=2,
            probe_prune=prune, backend="builtin",
        )
    )
    assert a == b


def test_knn_join_backends_identical(corpus):
    from implementing_scds_in_hive_spark.operators.similarity import knn_join

    a = _rows(knn_join(corpus, k=4, n_bits=3, backend="arrow"))
    b = _rows(knn_join(corpus, k=4, n_bits=3, backend="builtin"))
    assert a == b and len(a) > 0


def test_quantized_rescore_backends_identical(corpus, queries_df):
    from implementing_scds_in_hive_spark.operators.similarity import (
        quantize_corpus,
        quantized_rescore_topk,
    )

    cq = quantize_corpus(corpus)
    a = _rows(
        quantized_rescore_topk(cq, corpus, queries_df, k=6, backend="arrow")
    )
    b = _rows(
        quantized_rescore_topk(cq, corpus, queries_df, k=6, backend="builtin")
    )
    assert a == b and len(a) > 0


def test_semantic_pairs_backends_identical(corpus, centroids):
    from implementing_scds_in_hive_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    a = _rows(
        semantic_dedup_pairs(corpus, centroids, threshold=0.2, backend="arrow")
    )
    b = _rows(
        semantic_dedup_pairs(
            corpus, centroids, threshold=0.2, backend="builtin"
        )
    )
    assert a == b and len(a) > 0


def test_lsh_bucketed_backends_identical(corpus, queries_df):
    from implementing_scds_in_hive_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    a = _rows(lsh_bucketed_topk(corpus, queries_df, k=6, n_bits=4, backend="arrow"))
    b = _rows(lsh_bucketed_topk(corpus, queries_df, k=6, n_bits=4, backend="builtin"))
    assert a == b and len(a) > 0


def test_near_duplicates_backends_identical(corpus):
    from implementing_scds_in_hive_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    # the synthetic corpus plants exact duplicates -> pairs at 0.999
    a = _rows(embedding_near_duplicates(corpus, threshold=0.999, n_bits=4, backend="arrow"))
    b = _rows(embedding_near_duplicates(corpus, threshold=0.999, n_bits=4, backend="builtin"))
    assert a == b and len(a) > 0


def test_projected_rescore_backends_identical(corpus, queries_df):
    from implementing_scds_in_hive_spark.operators.similarity import (
        projected_rescore_topk,
        rp_project_corpus,
    )
    from pyspark.sql import functions as F

    cp = rp_project_corpus(corpus, dim_in=16, dim_out=8)
    qp = rp_project_corpus(
        queries_df.select(F.col("query_id").alias("vec_id"), "embedding"),
        dim_in=16, dim_out=8,
    ).select(F.col("vec_id").alias("query_id"), "rvec", "rnorm")
    a = _rows(projected_rescore_topk(corpus, queries_df, cp, qp, k=5, backend="arrow"))
    b = _rows(projected_rescore_topk(corpus, queries_df, cp, qp, k=5, backend="builtin"))
    assert a == b and len(a) > 0


@pytest.mark.parametrize("nprobe", [1, 2])
def test_knn_join_ivf_backends_identical(corpus, centroids, nprobe):
    from implementing_scds_in_hive_spark.operators.similarity import knn_join_ivf

    a = _rows(knn_join_ivf(corpus, centroids, k=4, nprobe=nprobe, backend="arrow"))
    b = _rows(knn_join_ivf(corpus, centroids, k=4, nprobe=nprobe, backend="builtin"))
    assert a == b and len(a) > 0


def test_knn_join_ivf_preassigned_matches(corpus, centroids):
    from implementing_scds_in_hive_spark.operators.similarity import knn_join_ivf

    assigned = ivf_assign(corpus, centroids, backend="arrow")
    a = _rows(knn_join_ivf(assigned, centroids, k=4, nprobe=2, backend="arrow"))
    b = _rows(knn_join_ivf(corpus, centroids, k=4, nprobe=2, backend="builtin"))
    assert a == b and len(a) > 0


def _skewed_group(n=3000, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    e = rng.normal(size=(n, dim))
    return ids, e


def _collect_blocks(gen):
    parts = list(gen)
    return tuple(
        np.concatenate([p[i] for p in parts]) for i in range(len(parts[0]))
    )


def test_knn_blocks_match_dense_path():
    """Row-block chunking is result-identical (values AND emission
    order) to the dense whole-group matrix it replaced."""
    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        _knn_self_topk_blocks,
    )

    ids, e = _skewed_group(n=503)
    dense = _collect_blocks(_knn_self_topk_blocks(ids, e, 5, block=10**9))
    chunked = _collect_blocks(_knn_self_topk_blocks(ids, e, 5, block=37))
    for d, c in zip(dense, chunked):
        assert np.array_equal(d, c)


def test_pairs_blocks_match_dense_path():
    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        _pairs_threshold_blocks,
    )

    ids, e = _skewed_group(n=503)
    dense = _collect_blocks(_pairs_threshold_blocks(ids, e, 0.3, block=10**9))
    chunked = _collect_blocks(_pairs_threshold_blocks(ids, e, 0.3, block=37))
    assert len(dense[0]) > 0
    for d, c in zip(dense, chunked):
        assert np.array_equal(d, c)


def test_grouped_kernel_memory_is_row_block_bounded():
    """A hot skewed bucket must not materialize the BxB float64 matrix
    in one task (guide §5 — the r14 dense path's OOM risk): peak NumPy
    allocation of the chunked core stays near block*B, an order of
    magnitude under B*B."""
    import tracemalloc

    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        _knn_self_topk_blocks,
        _pairs_threshold_blocks,
    )

    ids, e = _skewed_group(n=4000)
    # ONE dense BxB float64 matrix is 128 MB; the r14 path held ~9x that
    # across sims/key/rounding temporaries. The chunked core must peak
    # under even the single dense matrix (measured ~75 MB at block=256,
    # ~9x the 8.2 MB block matrix — same temporary factor, block-scaled).
    dense_matrix_bytes = 4000 * 4000 * 8
    tracemalloc.start()
    for _ in _knn_self_topk_blocks(ids, e, 5, block=256):
        pass
    _, peak_knn = tracemalloc.get_traced_memory()
    tracemalloc.reset_peak()
    for _ in _pairs_threshold_blocks(ids, e, 0.9, block=256):
        pass
    _, peak_pairs = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak_knn < dense_matrix_bytes, peak_knn
    assert peak_pairs < dense_matrix_bytes, peak_pairs


def test_collect_vectors_rejects_non_integral_ids(spark):
    """The arrow kernels carry ids as int64; a string/float id must fail
    loudly at collection instead of mis-sorting inside a kernel."""
    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        collect_vectors,
    )

    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integral id column"):
        collect_vectors(df, "vec_id", "embedding")


def test_quantized_coarse_query_id_type_follows_queries(spark):
    """The coarse stage's query_id column must type from the QUERIES'
    id, not the corpus id, when the two diverge (schema_match gate)."""
    from implementing_scds_in_hive_spark.operators.similarity import (
        quantize_corpus,
        quantized_rescore_topk,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 1.0])], "query_id int, embedding array<double>"
    )
    cq = quantize_corpus(corpus)
    out = quantized_rescore_topk(cq, corpus, queries, k=3, backend="arrow")
    assert dict(out.dtypes)["query_id"] == "int"
    assert out.count() == 3


def test_decimal10_ints_matches_spark_decimal_cast(spark):
    """The exact-mean kernel's scaled-integer quantization must replay
    Spark's cast(x as decimal(27,10)) including .5-boundary values at
    the 11th digit, where the float multiply's error exceeds a fixed
    suspect window (hence the magnitude-aware one)."""
    import random
    from decimal import Decimal

    from implementing_scds_in_hive_spark.operators.vector_kernels import (
        decimal10_ints,
    )

    rng = random.Random(42)
    vals = [
        0.00000000005, -0.00000000005, 0.00000000015, -0.00000000015,
        1.5e-11, 2.5e-11, 0.12345678905, -0.12345678905, 1.23456789015,
        -1e-12, 1e-12, 0.0, -0.0, 1.0, -1.0,
        9.99999999995, -9.99999999995, 123.45678901235, 4999.99999999995,
    ]
    vals += [rng.uniform(-10, 10) for _ in range(2000)]
    vals += [float(np.float32(rng.uniform(-1, 1))) for _ in range(2000)]
    got = decimal10_ints(np.array(vals, dtype=np.float64), "t")
    want = [
        int(Decimal(r[0]).scaleb(10))
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.col("x").cast("decimal(27,10)").cast("string"))
        .collect()
    ]
    for v, g, w in zip(vals, got, want):
        assert int(g) == w, (v, int(g), w)
    with pytest.raises(ValueError, match="finite"):
        decimal10_ints(np.array([1.0, float("nan")]), "t")


def test_kmeans_exact_mean_backends_identical(spark, corpus):
    """The fused assign+mean Arrow pass must reproduce the posexplode →
    decimal-sum means bit-for-bit (integer partials are associative, so
    partitioning cannot perturb them), including the float32 round-trip
    and empty-cluster carry-forward."""
    from implementing_scds_in_hive_spark.operators.similarity import kmeans_refine

    seed = corpus.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    a = sorted(
        (r[0], list(r[1]))
        for r in kmeans_refine(
            corpus, seed, n_iter=2, exact_mean=True, mean_backend="arrow"
        ).collect()
    )
    b = sorted(
        (r[0], list(r[1]))
        for r in kmeans_refine(
            corpus, seed, n_iter=2, exact_mean=True, mean_backend="builtin"
        ).collect()
    )
    assert a == b and len(a) > 0


def test_round_half_up_matches_spark_round(spark):
    """Adversarial values for the vectorized rounding: exact decimal .5
    boundaries at the 7th digit (np.round alone rounds HALF_EVEN),
    float-noise neighbors of boundaries, tiny magnitudes whose np.round
    is -0.0, non-finite passthrough, and a dense random sweep."""
    import random

    rng = random.Random(42)
    vals = [
        0.0000005, -0.0000005, 0.0000015, -0.0000015,  # exact-ish ties
        1.5e-6, 2.5e-6, -2.5e-6, 0.1234565, -0.1234565,
        0.12345650000000001, -1e-9, 1e-9, -4.9e-7, 4.9e-7,
        -0.0, 0.0, 1.0, -1.0,
        float("nan"), float("inf"), float("-inf"),
    ] + [rng.uniform(-1, 1) for _ in range(2000)]
    got = round_half_up(np.array(vals, dtype=np.float64))
    want = [
        r[0]
        for r in spark.createDataFrame(
            [(v,) for v in vals], "x double"
        ).select(F.round("x", 6)).collect()
    ]
    for v, g, w in zip(vals, got, want):
        if math.isnan(w):
            assert math.isnan(g), v
        else:
            assert g == w and math.copysign(1.0, g) == math.copysign(1.0, w), (
                v, g, w,
            )
