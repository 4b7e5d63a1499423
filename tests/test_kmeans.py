"""Convergence test for the iterative k-means centroid refinement."""

from implementing_scds_in_hive_spark.operators.similarity import ivf_assign, kmeans_refine


def test_kmeans_converges_to_cluster_means(spark):
    # two tight, well-separated clusters around (10,0) and (0,10)
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0 + (i % 5) * 0.1]) for i in range(30)]
    rows += [(100 + i, [0.0 + (i % 3) * 0.1, 10.0 + (i % 5) * 0.1]) for i in range(30)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # deliberately poor init: both centroids near cluster A, one slightly
    # tilted toward B so cosine assignment can split them
    init = spark.createDataFrame(
        [(0, [1.0, 0.2]), (1, [0.2, 1.0])], "centroid_id long, embedding array<double>"
    )
    cent = kmeans_refine(corpus, init, n_iter=3)
    got = {r["centroid_id"]: r["embedding"] for r in cent.collect()}
    assert len(got) == 2
    # each refined centroid must sit at its cluster's coordinate mean
    a = [10.0 + sum(i % 3 for i in range(30)) / 30 * 0.1, sum(i % 5 for i in range(30)) / 30 * 0.1]
    b = [sum(i % 3 for i in range(30)) / 30 * 0.1, 10.0 + sum(i % 5 for i in range(30)) / 30 * 0.1]
    got_sorted = sorted(got.values(), key=lambda v: v[0], reverse=True)
    for got_v, want_v in zip(got_sorted, [a, b]):
        for g, w in zip(got_v, want_v):
            assert abs(g - w) < 1e-9

    # and the refined assignment is the true clustering
    assigned = ivf_assign(corpus, cent)
    groups = {}
    for r in assigned.collect():
        groups.setdefault(r["centroid_id"], set()).add(r["vec_id"])
    sizes = sorted(len(v) for v in groups.values())
    assert sizes == [30, 30]
    assert {frozenset(v) for v in groups.values()} == {
        frozenset(range(30)),
        frozenset(range(100, 130)),
    }
