"""Winnowing fingerprints (operators/dedup.py:winnow_fingerprints).

The published guarantees (Schleimer et al., SIGMOD'03) under test:
(1) CORRECTNESS vs an independent Python reference implementation of
hash/window/min selection; (2) the DETECTION guarantee — two documents
sharing >= w + n - 1 consecutive tokens share a fingerprint no matter
how much unrelated text surrounds the passage; (3) DENSITY — the
selected set is a small fraction of all positional n-grams; (4) the
short-document convention (always at least one fingerprint).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.dedup import (
    shared_passage_candidates,
    winnow_fingerprints,
)

P, A = 2_147_483_647, 1_000_003


def _tok_hash(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P


def _py_winnow(text: str, n=3, w=4) -> list[int]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    th = [_tok_hash(t) for t in toks]
    psh = []
    for i in range(len(th) - n + 1):
        acc = th[i]
        for j in range(1, n):
            acc = (acc * A + th[i + j]) % P
        psh.append(acc)
    m = max(len(psh) - w + 1, 1)
    return sorted({min(psh[j : j + w]) for j in range(m)})


def _fps(spark, rows, n=3, w=4):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["did"]: list(r["fps"])
        for r in winnow_fingerprints(df, n=n, w=w, portable=True).collect()
    }


def test_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {
        r["did"]: list(r["fps"])
        for r in winnow_fingerprints(docs, portable=True).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == _py_winnow(r["text"]), r["doc_id"]


def test_shared_passage_guarantee(spark):
    # a 6-token passage (w + n - 1 = 4 + 3 - 1 = 6) embedded in
    # completely different surroundings MUST produce a shared fingerprint
    passage = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "xx yy zz " + passage + " qq ww ee"),
        (2, "one two three four " + passage + " five six"),
        (3, "totally unrelated words here nothing shared at all"),
    ]
    fps = _fps(spark, rows)
    assert set(fps[1]) & set(fps[2]), "guaranteed shared fingerprint missing"
    assert not (set(fps[1]) & set(fps[3]))
    cands = {
        (r["id_a"], r["id_b"])
        for r in shared_passage_candidates(
            winnow_fingerprints(
                spark.createDataFrame(rows, "doc_id bigint, text string"),
                portable=True,
            ),
            min_shared=1,
        ).collect()
    }
    assert (1, 2) in cands and (1, 3) not in cands


def test_density_is_a_fraction_of_all_ngrams(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = winnow_fingerprints(docs, n=3, w=8, portable=True)
    sel = fps.select(F.sum(F.size("fps"))).collect()[0][0]
    total = docs.select(
        F.sum(F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0)))
    ).collect()[0][0]
    # expected density ~ 2/(w+1) = 2/9 on random hashes; allow slack for
    # repeated tokens, assert it is a real reduction
    assert sel < total * 0.5


def test_short_document_yields_one_global_min(spark):
    rows = [(1, "a b c"), (2, "a b c d")]  # 1 and 2 shingles, both < w
    fps = _fps(spark, rows)
    assert len(fps[1]) == 1
    assert fps[1] == [_py_winnow("a b c")[0]]
    assert fps[2] == _py_winnow("a b c d")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=3, max_size=30).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    w=st.sampled_from([2, 4, 6]),
)
def test_random_corpora_match_reference(spark, texts, w):
    rows = [(i, t) for i, t in enumerate(texts)]
    fps = _fps(spark, rows, w=w)
    for i, t in rows:
        assert fps[i] == _py_winnow(t, w=w), (i, t)
