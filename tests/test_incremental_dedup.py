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


# --- decontamination ------------------------------------------------------

def test_decontaminate_drop_and_flag_agree(spark):
    from implementing_scds_in_hive_spark.operators.dedup import (
        contaminated_doc_ids,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "alpha beta gamma delta epsilon other words here"),  # shares doc1's 5-grams
            (4, "short text"),  # < n tokens: never contaminated
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    bad = {r.doc_id for r in contaminated_doc_ids(docs, ev, n=5).collect()}
    assert bad == {1, 3}
    kept = {r.doc_id for r in decontaminate(docs, ev, n=5, mode="drop").collect()}
    assert kept == {2, 4}
    flags = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, ev, n=5, mode="flag").collect()
    }
    assert flags == {1: True, 2: False, 3: True, 4: False}


def test_decontaminate_eval_shingles_broadcast(spark):
    # the 100 TB asymmetry: the EVAL side must be the broadcast build side
    from implementing_scds_in_hive_spark.operators.dedup import contaminated_doc_ids

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(200)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(0, " ".join(f"w7_{j}" for j in range(12)))], "doc_id long, text string")
    plan = (
        contaminated_doc_ids(docs, ev, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

def test_incremental_pairs_never_emit_self_pairs(spark):
    """r11 review: a batch re-ingesting a doc id the corpus already
    holds matched itself through the (band, bucket) join and emitted
    the degenerate (X, X, 1.0) pair — a downstream 'drop id_b' policy
    would delete the only copy."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        incremental_minhash_pairs,
        portable_minhash_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    idx = portable_minhash_index(docs).localCheckpoint(eager=True)
    # the batch IS part of the corpus (replay/overlap)
    pairs = incremental_minhash_pairs(idx, idx).collect()
    assert all(r["id_a"] != r["id_b"] for r in pairs), pairs


def test_lsh_params_validated(spark):
    """r11 review: bands that don't divide num_perm silently dropped
    trailing permutations (breaking the 1-(1-t^r)^b contract), and
    bands > num_perm degenerated the portable tier to 1-perm buckets."""
    import pytest

    from implementing_scds_in_hive_spark.operators.dedup import (
        minhash_lsh_pairs,
        portable_minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    for fn in (minhash_lsh_pairs, portable_minhash_lsh_pairs):
        with pytest.raises(ValueError, match="divide"):
            fn(docs, num_perm=32, bands=5).collect()
        with pytest.raises(ValueError, match="divide"):
            fn(docs, num_perm=32, bands=40).collect()


def test_dedup_exact_keeps_all_null_text_docs(spark):
    """r11 review: NULL fingerprints grouped together (groupBy compares
    NULLs equal), silently dropping all but one failed-extraction row.
    NULL text is unknown, not identical — all such docs are kept."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        dedup_exact,
        exact_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2
