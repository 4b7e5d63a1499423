"""Incremental (delta-batch vs corpus-index) MinHash dedup must agree
with running the full-corpus LSH over corpus ∪ batch: the cross-side
subset of the full run's pairs is exactly what the incremental probe
finds. Value equivalence against DuckDB runs in
test_pytest_only_oracles (dedup_incremental)."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    incremental_minhash_pairs,
    portable_minhash_index,
    portable_minhash_lsh_pairs,
)


def _docs(spark, sf_dir):
    from implementing_scds_in_hive_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "documents")


def test_incremental_agrees_with_full_rerun(spark, sf_dir):
    d = _docs(spark, sf_dir)
    corpus = d.where(F.col("doc_id") % 4 != 0)
    clones = corpus.where(F.col("doc_id") % 30 == 1).withColumn(
        "doc_id", F.col("doc_id") + 500_000
    )
    new = d.where(F.col("doc_id") % 4 == 0).unionByName(clones)

    inc = incremental_minhash_pairs(
        portable_minhash_index(corpus).persist(),
        portable_minhash_index(new).persist(),
        threshold=0.5,
    )
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}

    # full re-run over the union, restricted to cross-side pairs
    full = portable_minhash_lsh_pairs(corpus.unionByName(new), threshold=0.5)
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = set()
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if a in corpus_ids and b in new_ids:
            want.add((a, b))
        elif b in corpus_ids and a in new_ids:
            want.add((b, a))
    assert got == want
    # the planted clones guarantee the probe actually finds something
    assert any(b >= 500_000 for _, b in got)


def test_index_has_one_row_per_doc_with_bands(spark, sf_dir):
    d = _docs(spark, sf_dir).limit(50)
    ix = portable_minhash_index(d, num_perm=32, bands=8)
    rows = ix.collect()
    assert len(rows) == d.where(F.size(F.split("text", " ")) >= 3).count()
    assert all(len(r["bb"]) == 8 for r in rows)
    assert all(len({bb["band"] for bb in r["bb"]}) == 8 for r in rows)
