"""Unit checks for corpus-statistics scoring (functions/scoring.py).
Full-corpus value equivalence runs in test_pytest_only_oracles
(tfidf_keywords / unigram_prob_score)."""

from implementing_scds_in_hive_spark.functions.scoring import (
    tfidf_keywords,
    unigram_prob_score,
)


def _corpus(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the dog sat"),
        (3, "the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_hand_computed(spark):
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_keywords(_corpus(spark), k=2).collect()}
    # doc 1: 'cat' df=1 -> 1*(4/2)=2.0 ; 'sat' df=2 -> 4/3 ; 'the' df=3 -> 1.0
    assert out[(1, 1)]["tok"] == "cat" and out[(1, 1)]["score"] == 2.0
    assert out[(1, 2)]["tok"] == "sat"
    # doc 3: tf('the')=3 -> 3*4/4 = 3.0
    assert out[(3, 1)]["tok"] == "the" and out[(3, 1)]["score"] == 3.0


def test_tfidf_max_vocab_drops_tail_tokens(spark):
    # vocabulary capped to the 2 most-document-frequent tokens
    # ('the' df=3, 'sat' df=2): rare tokens can no longer be keywords
    out = tfidf_keywords(_corpus(spark), k=3, max_vocab=2)
    toks = {r["tok"] for r in out.collect()}
    assert toks == {"the", "sat"}


def test_unigram_prob_hand_computed(spark):
    # corpus tokens: the x5, sat x2, cat, dog -> total 9
    out = {r["doc_id"]: r for r in unigram_prob_score(_corpus(spark)).collect()}
    # doc 3: (5+5+5) / (9*3)
    assert out[3]["mean_prob"] == 15 / 27
    # doc 1: (5+1+2) / (9*3)
    assert out[1]["mean_prob"] == 8 / 27
    assert out[1]["n_tokens"] == 3


# --- bigram LM fluency score ---------------------------------------------

def test_bigram_logprob_matches_reference(spark):
    import math
    from collections import Counter

    from implementing_scds_in_hive_spark.functions.scoring import bigram_logprob_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "mat the on sat cat the"),  # same words, mangled adjacencies
        (4, "solo"),  # < 2 tokens: excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in bigram_logprob_score(docs).collect()}

    texts = {i: t.split(" ") for i, t in rows if len(t.split(" ")) >= 2}
    c2 = Counter((ws[i], ws[i + 1]) for ws in texts.values() for i in range(len(ws) - 1))
    c1 = Counter()
    for (u, _), c in c2.items():
        c1[u] += c
    vocab = len({t for ws in texts.values() for t in ws})
    k = 0.5
    for did, ws in texts.items():
        lps = [
            math.log((c2[(ws[i], ws[i + 1])] + k) / (c1[ws[i]] + k * vocab))
            for i in range(len(ws) - 1)
        ]
        assert got[did]["n_bigrams"] == len(lps)
        assert abs(got[did]["avg_logprob"] - sum(lps) / len(lps)) < 1e-12
    assert 4 not in got
    # fluency ordering: repeated adjacencies outscore the mangled doc
    assert got[1]["avg_logprob"] > got[3]["avg_logprob"]
    assert got[2]["avg_logprob"] > got[3]["avg_logprob"]


def test_pmi_collocations_reference_and_support_floor(spark):
    import math
    from collections import Counter

    import pytest

    from implementing_scds_in_hive_spark.functions.scoring import pmi_collocations

    # "new york" always adjacent (high PMI); "the" precedes many
    # different words, diluting every "the X" pair's PMI
    rows = [(i, "the cat saw the dog near new york while the bird flew to new york")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r["u"], r["v"]): (r["c_uv"], r["pmi"])
           for r in pmi_collocations(docs, min_count=6, k=50).collect()}

    texts = [t.split(" ") for _, t in rows]
    bi = Counter((ws[i], ws[i + 1]) for ws in texts for i in range(len(ws) - 1))
    un = Counter(t for ws in texts for t in ws)
    nb = sum(bi.values())
    nt = sum(un.values())
    for (u, v), (c_uv, pmi) in got.items():
        assert c_uv >= 6  # support floor enforced
        expect = math.log((bi[(u, v)] / nb) / ((un[u] / nt) * (un[v] / nt)))
        assert pmi == pytest.approx(expect, rel=1e-12)
    # collocation beats the diluted stop-word pair strictly
    assert got[("new", "york")][1] > got[("the", "cat")][1]


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus whose token frequencies are an exact power law
    freq(rank) = round(10000 * rank^-0.8) must fit slope ~ -0.8 with
    r2 ~ 1; numpy polyfit cross-checks the closed-form regression."""
    import math

    import numpy as np
    import pytest

    from implementing_scds_in_hive_spark.functions.scoring import zipf_fit

    freqs = [max(int(round(10000 * (r ** -0.8))), 1) for r in range(1, 101)]
    text = " ".join(f"w{r:03d} " * f for r, f in enumerate(freqs, 1)).split()
    docs = spark.createDataFrame([(0, " ".join(text))], "doc_id bigint, text string")
    row = zipf_fit(docs, top_n=100).collect()[0]
    assert row["n_tokens_fit"] == 100
    xs = [math.log(r) for r in range(1, 101)]
    ys = [math.log(f) for f in freqs]
    slope_np, intercept_np = np.polyfit(xs, ys, 1)
    assert row["slope"] == pytest.approx(slope_np, rel=1e-9)
    assert row["intercept"] == pytest.approx(intercept_np, rel=1e-9)
    assert row["slope"] == pytest.approx(-0.8, abs=0.02)  # rounding-limited
    assert row["r2"] > 0.999
