"""Byte-Pair-Encoding tokenizer training — distributed, deterministic,
oracle-replayable.

The industrial shape (Sennrich et al. 2016, and every production BPE
trainer since): the CORPUS is read once to build word frequencies; all
merge iterations then run over the word-frequency table, whose size is
the distinct-word vocabulary, not the corpus. At 100 TB of text that
one combinable word-count aggregation is the only corpus-scale stage —
each merge round is a pair-count aggregation over (typically) a few
million vocab rows, map-side combinable, with a 1-row argmax collect
per round (same driver-loop shape as ``kmeans_refine``).

Symbol representation: a word's segmentation is a string with symbols
joined by a DOUBLE space (``"l  o  w  </w>"``). A BPE merge of pair
(a, b) is then ``replace(' a  b ' -> ' ab ')`` over the singly-padded
string — and that is EXACTLY reference greedy BPE: the pattern's outer
single spaces consume one of the two boundary spaces on each side, so
consecutive non-overlapping occurrences each keep a space to match on,
while overlapping occurrences (``a a a`` + pair (a,a)) are consumed
left-to-right. (A single-space representation is NOT correct: the
pattern eats the shared boundary space and silently skips every other
occurrence in a run — found by the ``aaaa``/``aaaaa`` unit tests.)
Both Spark's and ANSI ``replace`` scan left-to-right without
re-matching inside a replacement, so the DuckDB oracle replays every
round with the identical primitive.

Determinism: argmax tie-break is (count desc, pair asc) — byte-wise
string order, identical across engines for this symbol space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"
SEP = "  "  # double-space symbol separator (see module docstring)


def word_frequencies(
    docs: DataFrame, *, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace tokenization — the single
    corpus-scale pass. Map-side combinable; output size = |vocabulary|."""
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    base = docs.select(tok).where(F.col("word") != "")
    if lowercase:
        base = base.select(F.lower("word").alias("word"))
    return base.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _initial_symbols(word) -> F.Column:
    """``'low'`` -> ``'l  o  w  </w>'``: every character double-spaced,
    plus the end-of-word marker (capture-group regex, ANSI-replayable)."""
    return F.concat(F.regexp_replace(word, "(.)", "$1" + SEP), F.lit(END_OF_WORD))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair 'a  b', cnt) — adjacent-symbol pairs weighted by word freq.
    One explode over the vocab + a combinable sum. The split is
    materialized as a column BEFORE the pair lambda references it —
    element_at on a computed expression re-evaluates the whole split
    per element access (the operators/dedup.py:_token_hashes lesson);
    on a plain column reference each access is O(1)."""
    syms = F.col("__syms")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat(F.element_at(syms, i), F.lit(SEP), F.element_at(syms, i + 1)),
    )
    return (
        vocab.select(F.split(F.col("syms_str"), SEP).alias("__syms"), "freq")
        .where(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_once(syms_str: F.Column, pair: str) -> F.Column:
    """Apply one merge to a canonical (unpadded, double-space-joined)
    symbol string: pad one space each side, replace `` a  b `` with
    `` ab ``, trim. Exact greedy left-to-right (module docstring)."""
    merged = pair.replace(SEP, "")
    return F.trim(
        F.replace(
            F.concat(F.lit(" "), syms_str, F.lit(" ")),
            F.lit(f" {pair} "),
            F.lit(f" {merged} "),
        )
    )


def bpe_train(
    docs: DataFrame,
    *,
    num_merges: int = 8,
    text_col: str = "text",
    lowercase: bool = True,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a document corpus. Returns a
    DataFrame ``(merge_rank int, pair string, merged string, cnt
    bigint)`` in merge order — the tokenizer's merge table (``pair`` is
    single-space-joined, merges.txt convention).

    Per round: pair-count aggregation over the vocab, 1-row argmax
    collect (count desc, pair asc), literal ``replace`` of the winning
    pair in every word's symbol string. Round state is carried via an
    eager ``localCheckpoint`` — a TRUE lineage cut, the same discipline
    as the label-propagation loop in operators/graph.py. A
    persist/unpersist chain is NOT enough: the logical plan still
    nests one replace layer per round, and per-round cost climbs from
    <1 s to 60 s by round 16 on a THIRTY-ONE-word vocabulary (measured,
    scripts/bpe_smoke.py — pure planner/expression-tower cost, no data
    involved); with the checkpoint every round plans against a flat
    LogicalRDD and cost stays constant (~0.2 s/round, 199 s -> 4.5 s
    for the 16-round smoke)."""
    spark = spark or docs.sparkSession
    vocab = word_frequencies(docs, text_col=text_col, lowercase=lowercase).select(
        _initial_symbols(F.col("word")).alias("syms_str"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0].pair, int(top[0].cnt)
        merges.append((rank, pair.replace(SEP, " "), pair.replace(SEP, ""), cnt))
        vocab = vocab.select(
            _merge_once(F.col("syms_str"), pair).alias("syms_str"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merged string, cnt bigint"
    )


def bpe_segment(
    words: DataFrame,
    merges: list[str],
    *,
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list (single-space pairs like ``'a b'``, in
    rank order) to segment words: adds ``bpe_tokens array<string>``.

    Encoding is the replace chain in merge order — semantically the
    reference BPE encoder. The chain is a nested expression of depth
    ``len(merges)``; fine for the dozens-of-merges analytical scale this
    module targets. A production tokenizer with 32k merges would encode
    via a per-word greedy loop in a pandas UDF instead — the TRAINING
    side above is the part that needs the cluster."""
    expr = _initial_symbols(F.col(word_col))
    for disp in merges:
        expr = _merge_once(expr, disp.replace(" ", SEP))
    return words.withColumn("bpe_tokens", F.split(expr, SEP))


def _encode_word_greedy(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy encode of ONE word: repeatedly find the
    lowest-rank adjacent pair present and merge ALL its occurrences
    left-to-right (overlaps consumed left-to-right, matching the
    padded-``replace`` primitive the trainer and the literal
    ``bpe_segment`` chain use — the equivalence the cross-tier tests
    pin). O(|word| * #distinct-pairs-applied), independent of the merge
    table size — the property that makes this the 32k-merge tier where
    the replace chain's expression depth cannot go.

    Equivalence with the sequential chain holds for every
    TRAINING-CONSISTENT merge table (each merge's operands are single
    characters or outputs of strictly lower-rank merges — the invariant
    ``bpe_train`` guarantees by construction): a merge (x,y)->xy only
    creates pairs involving the new symbol xy, so no earlier rank ever
    becomes newly applicable. A hand-built table violating the
    invariant CAN diverge (pinned in tests/test_bpe.py with the 'aab'
    counterexample hypothesis found)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best, best_rank = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (a, b), r
        if best is None:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Encode every document with a learned merge list (single-space
    pairs in rank order, as ``bpe_train`` emits): ``(id, n_tokens int,
    seg string)`` where ``seg`` is the flat token stream joined by
    single spaces. Tokenization (whitespace split, empty drop,
    optional lowercase) matches ``word_frequencies`` exactly.

    Arrow-batched ``mapInPandas`` with a per-batch distinct-word memo —
    natural-language batches repeat most words, so the greedy encoder
    runs once per DISTINCT word per batch, the same economics that make
    the trainer's word-frequency table the right corpus-scale
    representation. Scales in the merge-table size where the
    ``bpe_segment`` expression chain cannot (32k merges = 32k nested
    replaces would blow the codegen ceiling; here it is one dict)."""
    import re as _re

    from pyspark.sql import types as T

    ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
    split_ws = _re.compile(r"\s+")

    def batches(it):
        import pandas as pd

        for pdf in it:
            memo: dict[str, list[str]] = {}
            n_toks, segs = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in split_ws.split(text or ""):
                    if not w:
                        continue
                    if lowercase:
                        w = w.lower()
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word_greedy(w, ranks)
                    toks.extend(got)
                n_toks.append(len(toks))
                segs.append(" ".join(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_tokens": pd.Series(n_toks, dtype="int32"),
                    "seg": segs,
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("seg", T.StringType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(batches, schema)
