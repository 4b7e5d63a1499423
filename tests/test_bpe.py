"""BPE training (operators/bpe.py) vs a pure-Python reference
implementation of greedy left-to-right merge BPE — including the
repeated-symbol-run edges ('aaaa', 'aaaaa') where a naive string-replace
formulation silently diverges (the shared-boundary-space bug the
double-space representation exists to fix)."""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.bpe import (
    END_OF_WORD,
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def ref_bpe(word_freqs, n):
    """Reference trainer: tuple-of-symbols words, greedy left-to-right
    merge, tie-break (count desc, double-space pair string asc)."""
    vocab = {}
    for w, f in word_freqs.items():
        t = tuple(list(w) + [END_OF_WORD])
        vocab[t] = vocab.get(t, 0) + f
    merges = []
    for rank in range(1, n + 1):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "  " + kv[0][1]))
        merges.append((rank, f"{a} {b}", a + b, c))
        out_vocab = {}
        for syms, f in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            t = tuple(out)
            out_vocab[t] = out_vocab.get(t, 0) + f
        vocab = out_vocab
    return merges, vocab


def ref_from_texts(texts, n):
    wf = {}
    for t in texts:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return ref_bpe(wf, n)


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "aaaa aaaa aaaa baaab",
    "aaaaa",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_word_frequencies(docs):
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf["low"] == 5 and wf["newest"] == 6 and wf["aaaa"] == 3 and wf["aaaaa"] == 1


def test_merges_match_reference(docs):
    got = [tuple(r) for r in bpe_train(docs, num_merges=10).collect()]
    want, _ = ref_from_texts(CORPUS, 10)
    assert got == want


def test_repeated_symbol_runs_merge_greedily(spark):
    # 'aaaa' -> (aa, aa); 'aaaaa' -> (aa, aa, a) then (aaaa, a...) — the
    # exact greedy convention; a boundary-space-consuming replace gives
    # 'aa a aa' style splits instead
    d = spark.createDataFrame([(1, "aaaa aaaa aaaaa")], "doc_id long, text string")
    merges = [tuple(r) for r in bpe_train(d, num_merges=2).collect()]
    want, vocab = ref_bpe({"aaaa": 2, "aaaaa": 1}, 2)
    assert merges == want
    seg = bpe_segment(
        spark.createDataFrame([("aaaa",), ("aaaaa",)], "word string"),
        [m[1] for m in merges],
    )
    got_seg = {r.word: tuple(r.bpe_tokens) for r in seg.collect()}
    want_seg = {"".join(syms).removesuffix(END_OF_WORD): syms for syms in vocab}
    assert got_seg["aaaa"] == want_seg["aaaa"]
    assert got_seg["aaaaa"] == want_seg["aaaaa"]


def test_segment_matches_reference_vocab(docs):
    merges = [r.pair for r in bpe_train(docs, num_merges=6).collect()]
    _, vocab = ref_from_texts(CORPUS, 6)
    words = sorted({w for t in CORPUS for w in t.lower().split()})
    seg = bpe_segment(
        docs.sparkSession.createDataFrame([(w,) for w in words], "word string"), merges
    )
    got = {r.word: tuple(r.bpe_tokens) for r in seg.collect()}
    want = {"".join(syms).removesuffix(END_OF_WORD): syms for syms in vocab}
    for w in words:
        assert got[w] == want[w], w


def test_exhausted_pairs_stop_early(spark):
    d = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    # 'ab' has pairs (a,b),(b,</w>) then (ab,</w>)... until the word is
    # one symbol and no pairs remain; asking for 10 merges must not loop
    out = bpe_train(d, num_merges=10).collect()
    assert 0 < len(out) < 10
    assert out[0].pair == "a b" and out[0].cnt == 2


# --- greedy Arrow encode tier (r6) ---------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.bpe import (
    _encode_word_greedy,
    bpe_encode_docs,
)


def _chain_encode(word, merges):
    """Reference: the literal replace-chain semantics (bpe_segment's
    expression), replayed in pure Python string ops."""
    s = "  ".join(list(word)) + "  </w>"
    for m in merges:
        a = m.replace(" ", "  ")
        s = (" " + s + " ").replace(" " + a + " ", " " + m.replace(" ", "") + " ").strip()
    return s.split("  ")


def test_greedy_encoder_matches_chain_on_classic_corpus(spark):
    d = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest")],
        "doc_id long, text string",
    )
    merges = [r["pair"] for r in bpe_train(d, num_merges=8).collect()]
    for w in ("low", "lower", "newest", "widest", "lowest", "news", "zzz"):
        ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
        assert _encode_word_greedy(w, ranks) == _chain_encode(w, merges), w


def _training_consistent(merges):
    """The invariant every trained merge table satisfies: a merge's
    operands are single characters or outputs of strictly lower-rank
    merges. Under it, merging (x,y)->xy can only create pairs involving
    the NEW symbol xy, so no earlier rank ever becomes newly applicable
    and greedy-by-rank == sequential-chain. (Hypothesis found the
    counterexample for INCONSISTENT tables: word 'aab' with rank(aa,b) <
    rank(a,a) — greedy applies (aa,b) after (a,a) creates 'aa', the
    chain cannot go back. bpe_train can never emit such a table.)"""
    seen = {"a", "b", "</w>"}
    for m in merges:
        x, y = m.split(" ")
        if x not in seen or y not in seen:
            return False
        seen.add(x + y)
    return True


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    merge_perm=st.permutations(
        ["a a", "a b", "b a", "b b", "aa b", "ab a", "b ab", "aa aa"]
    ),
)
def test_greedy_encoder_equals_chain_semantics(word, merge_perm):
    """Property: the rank-priority greedy loop == the sequential
    replace chain for every TRAINING-CONSISTENT merge table, on an
    adversarial overlapping-merge alphabet (runs of 'a'/'b' are exactly
    where naive encoders diverge)."""
    from hypothesis import assume

    merges = list(merge_perm)
    assume(_training_consistent(merges))
    ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
    assert _encode_word_greedy(word, ranks) == _chain_encode(word, merges)


def test_greedy_diverges_on_inconsistent_table_documented():
    """Pin the boundary itself: on the table that VIOLATES the
    operand-before-use invariant, greedy and chain legitimately differ
    ('aab': greedy reaches [aab], the chain stops at [aa, b]) — the
    reason bpe_encode_docs documents the invariant rather than claiming
    unconditional equivalence."""
    merges = ["b b", "b a", "aa b", "a a", "a b"]
    ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
    assert not _training_consistent(merges)
    assert _encode_word_greedy("aab", ranks) == ["aab", "</w>"]
    assert _chain_encode("aab", merges) == ["aa", "b", "</w>"]


def test_bpe_encode_docs_matches_segment(spark):
    """The Arrow corpus encoder agrees with the literal bpe_segment
    expression chain word-by-word, and handles empty/whitespace docs."""
    d = spark.createDataFrame(
        [(1, "low lower low"), (2, ""), (3, "   "), (4, "Newest LOWER")],
        "doc_id long, text string",
    )
    merges = ["l o", "lo w", "e r", "low </w>"]
    got = {r["doc_id"]: r.asDict() for r in bpe_encode_docs(d, merges).collect()}
    assert got[2]["n_tokens"] == 0 and got[2]["seg"] == ""
    assert got[3]["n_tokens"] == 0 and got[3]["seg"] == ""
    words = spark.createDataFrame(
        [("low",), ("lower",), ("newest",)], "word string"
    )
    seg = {
        r["word"]: r["bpe_tokens"]
        for r in bpe_segment(words, merges).collect()
    }
    assert got[1]["seg"] == " ".join(seg["low"] + seg["lower"] + seg["low"])
    assert got[1]["n_tokens"] == 2 * len(seg["low"]) + len(seg["lower"])
    # lowercase folding matches word_frequencies' tokenization
    assert got[4]["seg"] == " ".join(seg["newest"] + seg["lower"])
