"""Training-data pipeline walkthrough: the engine's corpus operators
composed end-to-end over the testdata documents table.

    raw documents
      → PII redaction            (functions/privacy.py, zero-shuffle)
      → exact + near dedup       (operators/dedup.py + graph.py:
                                  connected components, keep canonical)
      → quality gate             (functions/text.py stats + corpus rules)
      → stratified sampling      (operators/sampling.py, content-addressed)
      → train/val/test splits    (operators/sampling.py assign_split)
      → token-window chunking    (functions/chunking.py)
      → sequence packing         (functions/chunking.py pack_sequences)
      → vocabulary head          (functions/scoring.py vocab_topk)

Prints corpus size after every stage. Every stage is a lazy DataFrame
transformation — the whole pipeline is ONE Catalyst plan per action,
and each stage's operator is individually value-verified against a
DuckDB oracle elsewhere (COVERAGE.md maps them).

Run: python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.chunking import chunk_text
from implementing_scds_in_hive_spark.functions.privacy import redact_pii
from implementing_scds_in_hive_spark.operators.dedup import (
    dedup_exact,
    ngram_jaccard_pairs,
)
from implementing_scds_in_hive_spark.operators.graph import canonical_members
from implementing_scds_in_hive_spark.operators.sampling import stratified_hash_sample
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.registry import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline", cpus=8)

    docs = load_table(spark, sf_dir, "documents")
    print(f"raw:                 {docs.count():6d} docs")

    # 1. scrub PII in place
    docs = docs.withColumn("text", redact_pii(F.col("text")))

    # 2a. drop exact duplicates (keep lowest-id representative)
    docs = dedup_exact(docs)
    print(f"after exact dedup:   {docs.count():6d} docs")

    # 2b. near-dup groups -> keep the canonical (longest) member
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    scored = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    groups = canonical_members(scored, pairs, score_col="n_tokens")
    drops = groups.where(~F.col("is_canonical")).select("doc_id")
    docs = docs.join(drops, "doc_id", "left_anti")
    print(f"after near dedup:    {docs.count():6d} docs")

    # 3. quality gate: minimum length, bounded mean token length
    toks = F.split(F.col("text"), " ")
    docs = docs.where(
        (F.size(toks) >= 20)
        & ((F.length("text") / F.size(toks)) <= 12)
    )
    print(f"after quality gate:  {docs.count():6d} docs")

    # 4. language-stratified sampling (up-weight low-resource langs)
    sample = stratified_hash_sample(
        docs,
        {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0},
        stratum_col="lang",
        default_fraction=0.5,
        salt="mix-v1",
    )
    print(f"after sampling:      {sample.count():6d} docs")
    sample.groupBy("lang").count().orderBy("lang").show()

    # 5. rebuild-stable train/val/test assignment (no leakage across
    #    re-runs: membership is a pure function of doc content)
    from implementing_scds_in_hive_spark.operators.sampling import assign_split

    sample = assign_split(sample, {"train": 0.9, "val": 0.05, "test": 0.05})
    sample.groupBy("split").count().orderBy("split").show()

    # 6. chunk into 64-token windows with 8-token overlap
    chunks = chunk_text(sample, size=64, stride=56)
    print(f"chunks:              {chunks.count():6d}")
    chunks.select("doc_id", "chunk_idx", F.substring("chunk", 1, 60).alias("head")).show(
        5, truncate=False
    )

    # 7. pack the train split into fixed-length training sequences
    #    (concat-and-chunk manifest; distributed prefix sums)
    from implementing_scds_in_hive_spark.functions.chunking import pack_sequences

    manifest = pack_sequences(sample.where("split = 'train'"), seq_len=128)
    print(f"packed sequences:    {manifest.select('seq_id').distinct().count():6d}")

    # 8. vocabulary head over the final train corpus
    from implementing_scds_in_hive_spark.functions.scoring import vocab_topk

    vocab_topk(sample.where("split = 'train'"), k=10).show()

    spark.stop()


if __name__ == "__main__":
    main()
