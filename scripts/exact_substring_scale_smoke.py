"""Exact-substring tier scale smoke (VERDICT r13 next-round #2).

Scales the corpus by replicating it into textually-ISOLATED copy groups
(every 7th token rewritten with a copy-specific token, so no >= 6-token
run crosses groups) while keeping the within-group duplication
structure fixed: each base doc gets one clone differing only in its
final token. Work and output should therefore scale LINEARLY with the
group count — the smoke measures wall time and asserts span-count
linearity exactly, which a corpus-quadratic implementation cannot pass
(cross-group candidate or gram joins would blow both).

Usage: python scripts/exact_substring_scale_smoke.py [sf_dir]
Results recorded in PLANS.md ("Exact-substring tier at scale").
"""

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    exact_substring_spans,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table

MIN_LEN, K = 12, 8


def corpus_at(base, s: int):
    """s isolated copy-groups; within each: base + a last-token-mutated
    clone (ids offset so groups and clones never collide)."""
    parts = []
    for c in range(s):
        ws = F.split("text", " ")
        # rewrite every 7th token: breaks any >= 6-token run ACROSS
        # differently-rewritten groups, keeps within-group runs intact
        rewritten = F.array_join(
            F.transform(
                ws,
                lambda t, i: F.when(
                    i % 7 == 0, F.concat(F.lit(f"g{c}x"), t)
                ).otherwise(t),
            ),
            " ",
        )
        g = base.select(
            (F.col("doc_id") + F.lit(c * 1_000_000)).alias("doc_id"),
            rewritten.alias("text"),
        )
        clone = g.select(
            (F.col("doc_id") + F.lit(500_000)).alias("doc_id"),
            F.concat(
                F.array_join(
                    F.slice(F.split("text", " "), 1, 9_999), " "
                ),
                F.lit(" ZZtail"),
            ).alias("text"),
        )
        # clone text = original tokens + a distinct trailing token: the
        # shared run is the full original length (>= MIN_LEN for any
        # doc of >= MIN_LEN tokens)
        parts.append(g)
        parts.append(clone)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main(sf_dir: str) -> None:
    spark = get_spark("xsub-scale-smoke")
    base = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    base = base.localCheckpoint(eager=True)
    report = {"sf_dir": sf_dir, "n_base": base.count(), "scales": {}}

    counts, times = {}, {}
    for s in (1, 2, 4):
        corpus = corpus_at(base, s).localCheckpoint(eager=True)
        n = corpus.count()
        t0 = time.time()
        spans = exact_substring_spans(corpus, min_len=MIN_LEN, k=K)
        c = spans.count()
        dt = round(time.time() - t0, 2)
        counts[s], times[s] = c, dt
        report["scales"][s] = {"n_docs": n, "n_spans": c, "sec": dt}
        print(f"# s={s}: {n} docs -> {c} spans in {dt}s", file=sys.stderr)

    # output linearity: isolated groups replicate the s=1 structure
    assert counts[2] == 2 * counts[1], (counts[1], counts[2])
    assert counts[4] == 4 * counts[1], (counts[1], counts[4])
    report["time_exponent_1_to_4"] = round(
        math.log(times[4] / times[1]) / math.log(4), 2
    ) if times[1] > 0 else None
    print(json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
