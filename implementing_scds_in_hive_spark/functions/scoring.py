"""Corpus-statistics document scoring: TF-IDF keywords and unigram-
probability quality scores.

Both are two-pass shapes: pass 1 aggregates corpus-level statistics
(vocabulary document/token frequencies — a map-side-combinable groupBy
on the token), pass 2 joins them back to per-document tokens. At scale
the vocabulary table is the small side (bounded by vocabulary size, not
corpus size) and broadcasts; the heavy side streams. A Zipf-head cap
(`max_vocab`) keeps a pathological vocabulary broadcastable — dropped
tail tokens score as unseen, which is the conservative direction for
quality scoring.

Cross-engine exactness (these back hash-compared oracles): no
transcendental functions. IDF is the exact rational ``(N + 1) /
(df + 1)`` instead of its logarithm — monotone-equivalent for ranking —
and the unigram score is ``sum(corpus_count over doc tokens) /
(corpus_total * doc_tokens)``: integer sums (exact, order-independent)
followed by ONE IEEE division, identical on any engine. A log-based
variant would differ in final ulps between libm implementations and
poison value-hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )


def tfidf_keywords(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int | None = None,
) -> DataFrame:
    """Top-``k`` characteristic tokens per document by TF-IDF:
    ``tf(doc, tok) * (N + 1) / (df(tok) + 1)``, ties broken by token
    text. Returns (doc_id, tok, rank, score)."""
    toks = _tokens(docs, id_col, text_col)
    n_docs = docs.count()  # one scalar job; the plan reuses the scan
    df_tbl = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    if max_vocab is not None:
        df_tbl = df_tbl.orderBy(F.col("df").desc(), "tok").limit(max_vocab)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    scored = tf.join(F.broadcast(df_tbl), "tok").withColumn(
        "score",
        F.col("tf").cast("double") * (n_docs + 1) / (F.col("df") + 1),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "tok", "rank", "score")
    )


def unigram_prob_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean corpus-unigram probability of a document's tokens — a
    cheap fluency/quality signal (documents of rare gibberish score
    near 0, documents of common words score high). Computed as
    ``sum(corpus_count(tok) for tok in doc) / (corpus_total *
    len(doc))``: the numerator and both denominator factors are exact
    integers, so the single division is engine-exact. Returns
    (doc_id, n_tokens, mean_prob)."""
    toks = _tokens(docs, id_col, text_col)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = toks.count()
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("__sum_cnt"), F.count("*").alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("__sum_cnt").cast("double")
                / (F.lit(total).cast("double") * F.col("n_tokens"))
            ).alias("mean_prob"),
        )
    )


def vocab_topk(
    docs: DataFrame,
    *,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent tokens with their
    global term count and document frequency — the first statistic any
    tokenizer/vocab-building pass computes over a pretraining corpus.

    Scale shape: ONE map-side-combinable aggregation on the token (the
    shuffle carries one row per (partition × distinct token), not one
    per token occurrence) followed by a distributed top-k —
    ``orderBy().limit()`` compiles to TakeOrderedAndProject, which keeps
    k rows per partition and merges k-lists on the driver; the full
    vocabulary is never globally sorted and never single-partitioned
    (asserted in tests/test_plan_shapes.py). Ties break by token text,
    so the result is deterministic and hash-comparable cross-engine.
    """
    toks = _tokens(docs, id_col, text_col)
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "tok")
        .limit(k)
    )


def bigram_logprob_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = 0.5,
) -> DataFrame:
    """Mean corpus-bigram log-probability per document — the next rung
    above :func:`unigram_prob_score` on the fluency ladder: unigram
    scoring cannot tell "the cat sat" from "sat the cat"; a bigram LM
    penalizes improbable ADJACENCIES, which is what separates shuffled
    or machine-mangled text from fluent text built from common words.

    Model: add-k smoothing, ``p(v|u) = (c(u,v) + k) / (c(u) + k|V|)``
    with ``c(u)`` the history count (= sum over v of c(u,v)) and |V|
    the corpus vocabulary size — both exact integers; the only float
    work is one log per distinct bigram. Returns
    ``(doc_id, n_bigrams, avg_logprob)``; documents with < 2 tokens
    have no bigram and are excluded.

    Scale shape: one explode to bigram instances, one combinable
    (u, v) count, history counts folded FROM the bigram table (one
    |bigrams|-row aggregation, not a second corpus pass), and the
    per-doc average groups on doc_id. The corpus is read once."""
    from implementing_scds_in_hive_spark.sources.registry import spread

    base = spread(docs).where(F.size(F.split(F.col(text_col), " ")) >= 2)
    ws = base.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("ws"))
    bigrams = ws.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("u"),
                    F.element_at(F.col("ws"), i + F.lit(1)).alias("v"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    c2 = bigrams.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("u").agg(F.sum("c2").alias("c1"))
    vocab_size = (
        ws.select(F.explode("ws").alias("tok")).select("tok").distinct().count()
    )
    lp = (
        bigrams.join(c2, ["u", "v"])
        .join(c1, "u")
        .select(
            "doc_id",
            F.log(
                (F.col("c2") + F.lit(k_smooth))
                / (F.col("c1") + F.lit(k_smooth * vocab_size))
            ).alias("lp"),
        )
    )
    return lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg("lp").alias("avg_logprob")
    )


def pmi_collocations(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information:
    ``pmi(u, v) = ln( p(u,v) / (p(u) p(v)) )`` over adjacent token
    pairs, with a ``min_count`` support floor (PMI is notoriously
    noisy on rare pairs — the floor is the standard fix). The corpus
    statistic behind phrase mining and collocation-aware tokenizer
    diagnostics.

    Exact integer counts (bigram, unigram, totals) + one log per
    surviving pair; ranking is deterministic (PMI desc, then pair).
    One corpus read; both count passes are map-side combinable; top-k
    compiles to TakeOrderedAndProject (no global sort)."""
    from implementing_scds_in_hive_spark.sources.registry import spread

    base = spread(docs).where(F.size(F.split(F.col(text_col), " ")) >= 2)
    ws = base.select(F.split(F.col(text_col), " ").alias("ws"))
    bigrams = ws.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("u"),
                    F.element_at(F.col("ws"), i + F.lit(1)).alias("v"),
                ),
            )
        ).alias("b")
    ).select(F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    c2 = bigrams.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c_uv"))
    uni = ws.select(F.explode("ws").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_bigrams = bigrams.count()
    n_tokens = ws.select(F.sum(F.size("ws"))).collect()[0][0]
    if not n_bigrams or not n_tokens:
        # no document has >= 2 tokens: sum() is NULL and float(None)
        # would raise while BUILDING the plan (r11 review) — an empty
        # result is the honest answer
        return ws.sparkSession.createDataFrame(
            [], "u string, v string, c_uv long, pmi double"
        )
    scored = (
        c2.where(F.col("c_uv") >= min_count)
        .join(uni.select(F.col("tok").alias("u"), F.col("c").alias("c_u")), "u")
        .join(uni.select(F.col("tok").alias("v"), F.col("c").alias("c_v")), "v")
        .select(
            "u",
            "v",
            "c_uv",
            F.log(
                (F.col("c_uv").cast("double") / F.lit(float(n_bigrams)))
                / (
                    (F.col("c_u").cast("double") / F.lit(float(n_tokens)))
                    * (F.col("c_v").cast("double") / F.lit(float(n_tokens)))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "u", "v").limit(k)


def zipf_fit(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """One-row Zipf diagnostic for the corpus vocabulary: least-squares
    slope of log(frequency) against log(rank) over the top-``top_n``
    tokens (natural text sits near slope -1; heavily templated or
    synthetic corpora flatten, boilerplate-dominated ones steepen).
    Returns ``(n_tokens_fit, slope, intercept, r2)``.

    Shape: the vocabulary head's combinable count + TakeOrdered top-n
    (never a global sort), then ranks assigned by a window over AT MOST
    ``top_n`` rows (explicitly bounded — the single-partition window is
    acceptable only because its input is capped by construction), and a
    closed-form least-squares aggregate. Ties rank deterministically
    (count desc, token)."""
    from pyspark.sql import Window

    head = (
        _tokens(docs, id_col, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(top_n)
    )
    w = Window.orderBy(F.col("c").desc(), "tok")
    xy = head.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    return agg.select(
        F.col("n").alias("n_tokens_fit"),
        ((F.col("mxy") - F.col("mx") * F.col("my"))
         / (F.col("mxx") - F.col("mx") * F.col("mx"))).alias("slope"),
        (F.col("my") - (F.col("mxy") - F.col("mx") * F.col("my"))
         / (F.col("mxx") - F.col("mx") * F.col("mx")) * F.col("mx")).alias("intercept"),
        (
            F.pow(F.col("mxy") - F.col("mx") * F.col("my"), F.lit(2.0))
            / (
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                * (F.col("myy") - F.col("my") * F.col("my"))
            )
        ).alias("r2"),
    )
