"""Exact-substring duplication tier (Lee et al. 2021 ExactSubstr
semantics, VERDICT r13 next-round #2): winnowed anchor candidates ->
candidate-bounded exact diagonal-run verification. The theorem test
replays the winnowing guarantee (candidates with window w = min_len-k+1
are a superset of every pair with a span >= min_len), so the winnowed
tier must equal exhaustive all-pairs verification span-for-span; the
property test replays random small corpora against an independent
Python brute force."""

import random

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    exact_substring_spans,
    remove_repeated_substrings,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )


def _all_pairs(d):
    a = d.select(F.col("doc_id").alias("id_a"))
    b = d.select(F.col("doc_id").alias("id_b"))
    return a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))


def _brute_spans(docs, min_len, k):
    """Independent reference: per pair, per diagonal, merge consecutive
    matching k-grams into maximal runs."""
    toks = {i: t.split(" ") for i, t in docs}
    out = set()
    ids = sorted(toks)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            ta, tb = toks[a], toks[b]
            if len(ta) < k or len(tb) < k:
                continue
            for d in range(-(len(tb) - k), len(ta) - k + 1):
                lo, hi = max(0, d), min(len(ta) - k, len(tb) - k + d)
                run, start = 0, None
                for pa in range(lo, hi + 1):
                    if ta[pa:pa + k] == tb[pa - d:pa - d + k]:
                        if run == 0:
                            start = pa
                        run += 1
                    else:
                        if run and run + k - 1 >= min_len:
                            out.add((a, b, start, start - d, run + k - 1))
                        run = 0
                if run and run + k - 1 >= min_len:
                    out.add((a, b, start, start - d, run + k - 1))
    return out


def test_winnowed_candidates_lossless_vs_exhaustive(spark):
    """THE theorem test: winnowing with w = min_len - k + 1 guarantees
    every pair with a shared run >= min_len is a candidate, so the
    winnowed tier's spans equal exhaustive all-pairs verification."""
    d = _docs(spark)
    got = sorted(map(tuple, exact_substring_spans(d, min_len=12, k=8).collect()))
    exhaustive = sorted(
        map(
            tuple,
            exact_substring_spans(
                d, min_len=12, k=8, candidates=_all_pairs(d)
            ).collect(),
        )
    )
    assert got == exhaustive
    assert len(got) > 0, "driver corpus should contain shared passages"


@pytest.mark.parametrize("seed", [7, 19, 83])
def test_spans_match_python_brute_force(spark, seed):
    """Random low-entropy corpora (4-letter alphabet forces accidental
    repeats, periodic runs, and overlapping diagonals) against an
    independent Python reference."""
    rng = random.Random(seed)
    alpha = ["a", "b", "c", "d"]
    docs = []
    base = [rng.choice(alpha) for _ in range(30)]
    for i in range(14):
        n = rng.randint(6, 40)
        t = [rng.choice(alpha) for _ in range(n)]
        if i % 3 == 0:  # plant a shared passage from the base sequence
            at = rng.randint(0, max(0, n - 12))
            t[at:at + 12] = base[5:17]
        docs.append((i, " ".join(t)))
    min_len, k = 8, 4
    expected = _brute_spans(docs, min_len, k)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        tuple(r)
        for r in exact_substring_spans(df, min_len=min_len, k=k).collect()
    }
    assert got == expected


def test_min_len_below_k_rejected(spark):
    d = _docs(spark)
    with pytest.raises(ValueError, match="must be >= k"):
        exact_substring_spans(d, min_len=3, k=8)


def test_no_shared_passages_is_empty(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s t u v w x y z a b"), (2, "n o m l k j i h g f e d c")],
        "doc_id int, text string",
    )
    out = exact_substring_spans(docs, min_len=12, k=8)
    assert out.columns == ["id_a", "id_b", "start_a", "start_b", "span_len"]
    assert out.count() == 0


def test_identical_triple_chain_removal(spark):
    """Three identical docs: both higher ids lose the whole text to the
    smallest id's canonical copy; removal does not cascade (spans are
    computed once against the originals)."""
    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, text)], "doc_id int, text string"
    )
    spans = exact_substring_spans(docs, min_len=12, k=8)
    assert sorted(
        (r["id_a"], r["id_b"], r["span_len"]) for r in spans.collect()
    ) == [(1, 2, 20), (1, 3, 20), (2, 3, 20)]
    out = {r["doc_id"]: r for r in remove_repeated_substrings(
        docs, spans=spans
    ).collect()}
    assert out[1]["text"] == text and out[1]["n_removed"] == 0
    for i in (2, 3):
        assert out[i]["text"] == "" and out[i]["n_removed"] == 20


def test_overlapping_spans_remove_union(spark):
    """Two spans overlapping on the same victim document remove the
    UNION of their positions — no double counting."""
    b_tokens = [f"x{i}" for i in range(30)]
    a1 = " ".join(b_tokens[0:15])   # shares B[0:15)
    a2 = " ".join(b_tokens[8:23])   # shares B[8:23)
    docs = spark.createDataFrame(
        [(1, a1), (2, a2), (9, " ".join(b_tokens))], "doc_id int, text string"
    )
    spans = exact_substring_spans(docs, min_len=12, k=8)
    victim = {(r["id_a"], r["id_b"], r["start_b"], r["span_len"])
              for r in spans.collect() if r["id_b"] == 9}
    assert victim == {(1, 9, 0, 15), (2, 9, 8, 15)}
    out = {r["doc_id"]: r for r in remove_repeated_substrings(
        docs, spans=spans
    ).collect()}
    assert out[9]["n_removed"] == 23  # union of [0,15) and [8,23)
    assert out[9]["text"] == " ".join(b_tokens[23:])


def test_null_text_passes_through(spark):
    shared = " ".join(f"s{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, None)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in remove_repeated_substrings(docs).collect()}
    assert out[3]["text"] is None and out[3]["n_removed"] == 0
    assert out[2]["text"] == "" and out[2]["n_removed"] == 15


def test_span_coverage_counts_union_and_zero_cases(spark):
    """Coverage = union of victim-side span positions / token count;
    span-free and lower-id docs report 0; the overlap construction from
    the removal test must yield 23/30."""
    from implementing_scds_in_hive_spark.operators.dedup import span_coverage

    b_tokens = [f"x{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(b_tokens[0:15])),
            (2, " ".join(b_tokens[8:23])),
            (9, " ".join(b_tokens)),
            (77, "totally unrelated words only here"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in span_coverage(docs, min_len=12, k=8).collect()}
    assert got[9]["n_covered"] == 23 and abs(got[9]["coverage"] - round(23 / 30, 6)) < 1e-9
    # doc 2 is victim of (1,2): spans share b[8:15) = 7 tokens < 12 — no
    # qualifying span, so zero; doc 1 is lowest id everywhere: zero
    assert got[1]["n_covered"] == 0 and got[2]["n_covered"] == 0
    assert got[77]["coverage"] == 0.0
    assert set(got) == {1, 2, 9, 77}  # one row per input doc
