"""Unit semantics of connected components + canonical election
(operators/graph.py). The sf-scale value equivalence against DuckDB's
recursive CTE runs in test_pytest_only_oracles (dedup_canonical)."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.graph import (
    canonical_members,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_transitive_chain_is_one_component(spark):
    # 1-2, 2-3, 3-4: no direct 1-4 pair, still one group (diameter 3
    # exercises multi-round propagation)
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_keep_separate_labels(spark):
    comp = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 20)])
    assert comp[1] == comp[2] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == 20
    assert len({comp[1], comp[10], comp[20]}) == 3


def test_edge_direction_is_irrelevant(spark):
    assert _cc(spark, [(5, 2), (2, 9)]) == _cc(spark, [(2, 5), (9, 2)])


def test_canonical_election_max_score_then_min_id(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)], "doc_id long, score long"
    )
    rows = {r["doc_id"]: r for r in canonical_members(docs, pairs).collect()}
    # component {1,2,3}: 2 and 3 tie at score 9 -> min id 2 wins
    assert rows[1]["canonical_id"] == 2
    assert rows[2]["is_canonical"] is True
    assert rows[3]["is_canonical"] is False
    # component {10,11}: tie at 4 -> 10 wins
    assert rows[10]["is_canonical"] is True
    assert rows[11]["canonical_id"] == 10
    # drop set = non-canonical rows
    drops = {d for d, r in rows.items() if not r["is_canonical"]}
    assert drops == {1, 3, 11}


def test_nonconvergence_raises_instead_of_silent_split(spark):
    import pytest

    df = spark.createDataFrame([(i, i + 1) for i in range(1, 10)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_converges_within_max_iter_on_long_chain(spark):
    n = 12
    edges = [(i, i + 1) for i in range(1, n)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {1}
    assert len(comp) == n

def test_canonical_election_type_safe_for_string_ids(spark):
    """r11 review (confirmed live): the tie-break negated the NODE id,
    which threw CAST_INVALID_INPUT for string doc ids under ANSI mode.
    The election must be type-safe: max score, ties to smallest id."""
    from implementing_scds_in_hive_spark.operators.graph import (
        canonical_members,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 2.0), ("x", 5.0), ("y", 5.0)],
        "doc_id string, score string",
    ).selectExpr("doc_id", "CAST(score AS DOUBLE) AS score")
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_members(docs, pairs).collect()
    }
    # b and c tie at 2.0 -> smallest id 'b' wins; x/y tie -> 'x'
    assert out["a"] == "b" and out["b"] == "b" and out["c"] == "b"
    assert out["x"] == "x" and out["y"] == "x"


def test_pagerank_rejects_absent_or_duplicate_seeds(spark):
    """r11 review: an absent seed silently zeroed part of the teleport
    distribution (mass decays toward 0 with meaningless order);
    duplicates mis-scaled 1/len. Both must be handled loudly."""
    import pytest

    from implementing_scds_in_hive_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="do not appear"):
        pagerank(edges, seeds=["nope"], iterations=2)
    # duplicate seeds: deduped, mass sums to ~1
    pr = pagerank(edges, seeds=["a", "a"], iterations=3)
    total = pr.agg({"pr": "sum"}).collect()[0][0]
    assert 0.97 < total < 1.03, total
