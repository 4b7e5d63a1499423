"""Repetition-based quality signals for training-data filtering.

The standard corpus-quality heuristics beyond length/stopword ratios
(functions/text.py) are repetition measures over word n-grams — the
"duplicate n-gram fraction" and "most-common n-gram fraction" family
used by large-scale web-corpus pipelines to drop boilerplate and
machine-generated spam. Both are computed HERE as single in-row
expression chains over the materialized token-hash array: zero
shuffles, zero UDFs, linear in document length — per-document work that
scales embarrassingly at 100 TB.

Formulation: shingle the token hashes (keeping duplicates), sort the
array, then one ``F.aggregate`` pass over the sorted array counts, per
run of equal values, how many positions belong to runs of length >= 2
(duplicate fraction) and the longest run (top fraction). Sorting makes
both O(L log L) with no per-element re-scan.

Oracle replay: with the portable token-hash family
(operators/dedup.py) the shingle identities are engine-independent, so
a SQL engine replays the same numbers relationally (unnest -> GROUP BY
shingle -> SUM/MAX of counts) — see REPETITION_SQL in
plans/pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _run_stats(sorted_arr: Column) -> Column:
    """struct<dup: int, top: int> over a SORTED array: ``dup`` = number
    of positions inside runs of length >= 2, ``top`` = longest run."""
    init = F.struct(
        F.lit(None).cast("bigint").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("dup"),
        F.lit(0).alias("top"),
    )

    def step(acc: Column, x: Column) -> Column:
        closing = acc["run"] >= 2  # the run that just ended was a duplicate run
        new_run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(
                x.eqNullSafe(acc["prev"]), acc["dup"]
            ).otherwise(acc["dup"] + F.when(closing, acc["run"]).otherwise(F.lit(0))).alias("dup"),
            F.greatest(acc["top"], new_run).alias("top"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            (acc["dup"] + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0))).alias("dup"),
            acc["top"].alias("top"),
        )

    return F.aggregate(sorted_arr, init, step, finish)


def repetition_stats(th: Column, n: int, shingle_fn) -> dict[str, Column]:
    """Repetition measures over word ``n``-grams of a token-hash array.

    ``shingle_fn(th, n)`` builds the (non-distinct) shingle-hash array —
    pass ``operators.dedup._shingle_hashes`` (xxhash64 scale default) or
    a portable-family builder when a SQL oracle must replay the values.

    Returns columns keyed ``dup_frac`` (fraction of n-gram positions in
    duplicated n-grams; 0.0 when the document has < n tokens) and
    ``top_frac`` (fraction covered by the single most frequent n-gram).
    """
    sh = F.array_sort(shingle_fn(th, n))
    stats = _run_stats(sh)
    size = F.size(sh)
    return {
        "dup_frac": F.when(
            size > 0, stats["dup"].cast("double") / size.cast("double")
        ).otherwise(F.lit(0.0)),
        "top_frac": F.when(
            size > 0, stats["top"].cast("double") / size.cast("double")
        ).otherwise(F.lit(0.0)),
    }
