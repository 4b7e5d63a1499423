"""Text-analysis column expressions (training-data pipeline surface).

All JVM-side built-ins — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly. Tokenization is single-space
split (matching the corpus format and portable to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# languages scored by their highest-frequency function words; counting is
# substring occurrences of " w " which both Spark and DuckDB express as
# (len(s) - len(replace(s, pat))) / len(pat)
LANG_MARKERS = {
    "en": (" the ", " a "),
    "fr": (" le ", " la "),
    "de": (" der ", " und "),
    "es": (" el ", " de "),
}


def tokens(text: str | Column) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def occurrences(text: Column, pat: str) -> Column:
    """Count non-overlapping occurrences of ``pat`` via length arithmetic
    (portable: no regex engine differences)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(pat), F.lit("")))) / F.lit(len(pat))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum(occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """n-gram-heuristic language ID: argmax of marker-word counts,
    'und' (undetermined) when no marker fires."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(score.alias("score"), F.lit(lang).alias("lang")) for lang, score in scores.items()]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def avg_token_len(text: Column) -> Column:
    n = F.size(F.split(text, " "))
    total = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return (total / n).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0,1]: length band + stopword
    presence + reasonable mean token length (the shape a pretraining
    quality filter takes; weights are illustrative)."""
    n_tok = F.size(F.split(text, " "))
    len_ok = (n_tok >= 20) & (n_tok <= 10_000)
    stop_ratio = lang_scores(text)["en"] / n_tok
    tok_len = avg_token_len(text)
    return (
        len_ok.cast("double") * 0.4
        + (stop_ratio > 0.01).cast("double") * 0.3
        + ((tok_len >= 3) & (tok_len <= 10)).cast("double") * 0.3
    ).cast("double")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercased text (identical in DuckDB)."""
    return F.md5(F.lower(F.trim(text)))


def shingles_from_tokens(ws: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> from a MATERIALIZED token
    array column. ``ws`` must be a real column (``withColumn('ws',
    split(...))``), never an inline ``split(...)`` expression: expressions
    referenced inside a higher-order-function lambda are re-evaluated on
    every element access (no CSE across lambda invocations), which turns
    shingling O(tokens^2) per document. Hash-identity consumers should
    prefer operators.dedup.shingled_hashes — numeric, no string
    allocation."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.array_join(F.slice(ws, (i + 1).cast("int"), n), " "),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
