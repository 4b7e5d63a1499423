"""BPE trainer scale smoke: per-round cost profile at sf0.1.

The claim to verify: after the single corpus-scale word-frequency pass,
each merge round's cost tracks the VOCABULARY (and shrinks as merges
collapse symbols), not the corpus — the property that makes distributed
BPE training viable at 100 TB of text. Records the word-freq pass time,
vocab size, and per-round wall times for 16 merges.

Usage: python scripts/bpe_smoke.py [sf_dir]   (default sf0.1)
Results recorded in PLANS.md ("Round-5 operators at scale").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.bpe import (
    _initial_symbols,
    _merge_once,
    _pair_counts,
    word_frequencies,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def main(sf_dir: str) -> None:
    spark = get_spark("bpe-smoke")
    docs = load_table(spark, sf_dir, "documents").select("text")
    n_docs = docs.count()

    t0 = time.time()
    wf = word_frequencies(docs).persist()
    vocab_size = wf.count()
    t_wordfreq = round(time.time() - t0, 2)

    vocab = wf.select(
        _initial_symbols(F.col("word")).alias("syms_str"), "freq"
    ).localCheckpoint(eager=True)
    wf.unpersist()

    rounds = []
    for rank in range(1, 17):
        t0 = time.time()
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        pair, cnt = top[0].pair, int(top[0].cnt)
        vocab = vocab.select(
            _merge_once(F.col("syms_str"), pair).alias("syms_str"), "freq"
        ).localCheckpoint(eager=True)
        rounds.append(
            {
                "rank": rank,
                "pair": pair.replace("  ", " "),
                "cnt": cnt,
                "t_s": round(time.time() - t0, 2),
            }
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "vocab_size": vocab_size,
                "t_wordfreq_pass_s": t_wordfreq,
                "t_per_round_first4_s": [r["t_s"] for r in rounds[:4]],
                "t_per_round_last4_s": [r["t_s"] for r in rounds[-4:]],
                "t_rounds_total_s": round(sum(r["t_s"] for r in rounds), 2),
                "first_merges": [r["pair"] for r in rounds[:8]],
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
