

def test_semantic_dedup_components_and_cluster_blocking(spark):
    """SemDeDup semantics: within-cluster near-dup components collapse
    to the smallest-id representative (transitively — A~B, B~C drops
    both B and C even if A~C was never emitted); unpaired vectors all
    survive; and the documented recall trade is real — a near-dup pair
    SPLIT across two clusters is NOT deduped."""
    from implementing_scds_in_hive_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    # two orthogonal centroids; cluster membership by construction
    cent = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "centroid_id long, embedding array<double>",
    )
    rows = [
        # cluster 100: a transitive chain 1~2 (cos 1.0), 2~3 (high),
        # 1~3 also high — one survivor: id 1
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.98, 0.2, 0.0]),
        # cluster 100: far from the chain -> unpaired, survives
        (4, [1.0, 0.0, 3.0]),
        # boundary pair: 5 lands in cluster 100, 6 in cluster 200,
        # though 5 and 6 are nearly parallel to each other
        (5, [1.0, 0.9, 0.0]),
        (6, [0.9, 1.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(e, cent, threshold=0.9).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs
    assert (5, 6) not in pairs, "cross-cluster pair must be blocked"
    assert not any(4 in p for p in pairs)

    kept = {
        r["vec_id"] for r in semantic_dedup(e, cent, threshold=0.9).collect()
    }
    assert kept == {1, 4, 5, 6}, kept  # chain -> 1; others survive
