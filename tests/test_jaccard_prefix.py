"""Prefix-filtered exact Jaccard join (operators/dedup.jaccard_prefix_pairs).

The claim under test is LOSSLESSNESS: prefix filtering must return exactly
the pairs the exhaustive inverted-index tier returns — same ids, same
jaccard values — at every threshold, while indexing only prefix shingles.
Verified three ways: against the exhaustive operator on real sf0.001
documents, against an independent pure-Python brute force over random
corpora (hypothesis), and on adversarial shapes (identical docs, subset
containment at the exact threshold boundary, ubiquitous stop-shingles).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)


def _pairs(df):
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in df.collect()}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _brute_force(rows, n, t):
    """Independent oracle: per-doc distinct n-gram sets, all-pairs exact
    Jaccard in plain Python (no shared code with the operator)."""
    sets = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        grams = {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        if grams:
            sets[doc_id] = grams
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= t:
                out[(a, b)] = round(j, 9)
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_matches_exhaustive_tier_on_sf0001(spark, sf_dir, threshold):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exhaustive = _pairs(ngram_jaccard_pairs(docs, threshold=threshold))
    prefix = _pairs(jaccard_prefix_pairs(docs, threshold=threshold))
    assert prefix == exhaustive


def test_identical_docs_and_boundary_subset(spark):
    # doc 2 = doc 1 exactly; doc 3's shingle set strictly contains doc 4's
    # with |inter|/|union| landing exactly ON the threshold
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "p q r s t u v"),  # 5 shingles
        (4, "p q r s t"),  # 3 shingles, all shared -> J = 3/5 = 0.6
    ]
    docs = _docs(spark, rows)
    got = _pairs(jaccard_prefix_pairs(docs, threshold=0.6))
    assert got[(1, 2)] == 1.0
    assert got[(3, 4)] == 0.6  # boundary pair must NOT be lost
    got_strict = _pairs(jaccard_prefix_pairs(docs, threshold=0.61))
    assert (3, 4) not in got_strict and (1, 2) in got_strict


def test_stop_shingle_corpus_stays_lossless(spark):
    # every doc shares a ubiquitous prefix phrase (the shape that blows up
    # the plain inverted index and that df-caps handle by dropping recall)
    rows = [(i, "the quick brown fox jumps over " + w1 + " " + w2)
            for i, (w1, w2) in enumerate([("lazy", "dog"), ("lazy", "cat"),
                                          ("tired", "dog"), ("lazy", "dog"),
                                          ("happy", "fish"), ("lazy", "doge")])]
    docs = _docs(spark, rows)
    t = 0.5
    expect = _brute_force(rows, 3, t)
    assert expect  # the corpus genuinely has qualifying pairs
    assert _pairs(jaccard_prefix_pairs(docs, threshold=t)) == expect


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.25, 0.4, 0.5, 0.75, 0.9]),
    n=st.sampled_from([1, 2, 3]),
)
def test_random_corpora_match_brute_force(spark, corpus, threshold, n):
    rows = [(i, text) for i, text in enumerate(corpus)]
    docs = _docs(spark, rows)
    got = _pairs(jaccard_prefix_pairs(docs, n=n, threshold=threshold))
    assert got == _brute_force(rows, n, threshold)


def test_prefix_indexes_fewer_postings_than_full(spark, sf_dir):
    """The point of the operator: the candidate index holds only
    |x| - ceil(t|x|) + 1 postings per doc, so at t=0.8 it must be well
    under a third of the full inverted index."""
    import pyspark.sql.functions as F

    from implementing_scds_in_hive_spark.operators.dedup import shingled_hashes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingled_hashes(docs)
    full = sh.select(F.explode("sh")).count()
    t = 0.8
    prefix = sh.select(
        (F.size("sh") - F.ceil(F.lit(t) * F.size("sh") - 1e-9) + 1).alias("p")
    ).agg(F.sum("p")).collect()[0][0]
    assert prefix < full / 3
