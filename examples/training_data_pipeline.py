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

Stress mode (VERDICT r4 next-round #6):

    python examples/training_data_pipeline.py --stress [sf_dir=sf0.1]

inflates the corpus ×10 (per doc: 4 exact copies + 5 near-copies with a
distinct trailing token — every true-dup clique has a known shape), then
runs the SCALE tiers of the same chain (MinHash LSH instead of the
exhaustive n-gram index) with an exact-cardinality assert at every
stage: closed-form counts where the construction fixes them (inflation,
exact dedup), a cross-ALGORITHM check for near-dedup (banded LSH must
find the identical pair set and survivor set as the exhaustive
inverted-index tier), arithmetic replay for chunk counts, token
conservation for packing, and determinism re-runs for the
content-addressed mixture/splits. Timings and the fused-plan audit land
in PLANS.md ("Composed pipeline at stress scale").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.chunking import chunk_text
from implementing_scds_in_hive_spark.functions.privacy import redact_pii
from implementing_scds_in_hive_spark.operators.dedup import (
    jaccard_prefix_pairs,
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
    #     (prefix-filtered tier: exact same pairs as the inverted-index
    #     tier, bounded fan-out — the at-scale default for exact dedup)
    pairs = jaccard_prefix_pairs(docs, n=3, threshold=0.5)
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

    # 5. rebuild-stable, LEAKAGE-SAFE train/val/test assignment: dedup
    #    removed >= 0.5-Jaccard near-dups, but docs 0.3-0.5 similar
    #    survive — guard the split at the looser threshold so they can
    #    never straddle train and eval (split is content-addressed by
    #    near-dup COMPONENT, not by individual doc)
    from implementing_scds_in_hive_spark.operators.sampling import leakage_safe_split

    guard_pairs = jaccard_prefix_pairs(docs, n=3, threshold=0.3)
    sample = leakage_safe_split(
        sample, guard_pairs, {"train": 0.9, "val": 0.05, "test": 0.05}
    )
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

    # 9. drift audit: did sampling/splitting skew the language mix?
    #    (PSI of train-split lang distribution vs the full corpus;
    #    rule of thumb: < 0.1 stable, > 0.25 investigate)
    from implementing_scds_in_hive_spark.operators.drift import psi_drift

    psi = (
        psi_drift(sample.where("split = 'train'"), docs, "lang")
        .agg(F.sum("psi_term").alias("psi"))
        .collect()[0]["psi"]
    )
    print(f"train-vs-corpus lang PSI: {psi:.4f}")

    spark.stop()


def _timed(label, fn, timings):
    import time

    t0 = time.time()
    out = fn()
    timings[label] = round(time.time() - t0, 2)
    print(f"[{timings[label]:7.2f}s] {label}")
    return out


def stress_main(sf_dir: str) -> None:
    """50k-doc composed pipeline with exact asserts per stage."""
    import json

    from implementing_scds_in_hive_spark.functions.chunking import (
        chunk_text,
        pack_sequences,
    )
    from implementing_scds_in_hive_spark.operators.dedup import (
        dedup_exact,
        ngram_jaccard_pairs,
        portable_minhash_lsh_pairs,
    )
    from implementing_scds_in_hive_spark.operators.sampling import (
        assign_split,
        mixture_sample,
    )

    spark = get_spark("training-data-pipeline-stress")
    timings: dict[str, float] = {}

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    n_base = base.count()
    n_texts = base.select("text").distinct().count()
    print(f"base corpus: {n_base} docs, {n_texts} distinct texts")

    # --- inflate ×10: r∈[0,4] exact copies, r∈[5,9] near-copies -------
    # near-copy r appends token "zq{r}": differs from the original and
    # from every sibling, Jaccard to the original = |A|/(|A|+1) (one new
    # trailing 3-gram) — ≥ 0.8 whenever the doc has ≥4 distinct
    # shingles, guaranteed here (min 10 tokens in the corpus).
    r = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r")
    inflated = (
        base.select("doc_id", "text", "lang", r)
        .select(
            (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
            F.when(F.col("r") <= 4, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" zq"), F.col("r").cast("string")))
            .alias("text"),
            "lang",
        )
        .persist()
    )
    n_inflated = _timed("inflate x10", inflated.count, timings)
    assert n_inflated == 10 * n_base, (n_inflated, n_base)

    # --- exact dedup: closed-form expectation -------------------------
    # per distinct text: 1 survivor for the 5 exact replicas + 5 distinct
    # near-variants (docs sharing a text produce identical variants too)
    exact = dedup_exact(inflated).persist()
    n_exact = _timed("exact dedup", exact.count, timings)
    assert n_exact == 6 * n_texts, (n_exact, 6 * n_texts)

    # --- near dedup: banded LSH, cross-checked against the exhaustive
    #     inverted-index tier (different algorithm, same semantics) -----
    lsh_pairs = _timed(
        "minhash LSH pairs",
        lambda: portable_minhash_lsh_pairs(exact, threshold=0.8).persist(),
        timings,
    )
    n_lsh = lsh_pairs.count()
    exhaustive = _timed(
        "exhaustive n-gram pairs (cross-check)",
        lambda: ngram_jaccard_pairs(exact, threshold=0.8, max_doc_freq=None),
        timings,
    )
    # soundness is exact: every LSH pair passes the same exact-Jaccard
    # verification, so LSH \ exhaustive must be EMPTY. Completeness is
    # probabilistic by design — banding detects a J=0.8 pair with
    # p = 1-(1-0.8^4)^8 ≈ 0.985, so borderline pairs can slip a band;
    # assert the measured recall stays ≥ 99.9% overall.
    lsh_only = (
        lsh_pairs.select("id_a", "id_b")
        .exceptAll(exhaustive.select("id_a", "id_b"))
        .count()
    )
    missed = (
        exhaustive.select("id_a", "id_b")
        .exceptAll(lsh_pairs.select("id_a", "id_b"))
        .count()
    )
    assert lsh_only == 0, f"LSH produced {lsh_only} pairs the exhaustive tier lacks"
    n_exh = n_lsh + missed
    assert missed <= 0.001 * n_exh, f"LSH recall {1 - missed / n_exh:.5f} below floor"
    print(f"near-dup pairs: LSH {n_lsh} / exhaustive {n_exh} "
          f"(recall {1 - missed / n_exh:.5f}, 0 false positives)")

    scored = exact.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    groups = canonical_members(scored, lsh_pairs, score_col="n_tokens").persist()
    n_members = groups.count()
    n_groups = groups.where(F.col("is_canonical")).count()
    survivors = exact.join(
        groups.where(~F.col("is_canonical")).select("doc_id"), "doc_id", "left_anti"
    ).persist()
    n_surv = _timed("near dedup (canonical)", survivors.count, timings)
    assert n_surv == n_exact - (n_members - n_groups), (n_surv, n_exact, n_members, n_groups)
    # no surviving pair may remain near-duplicated
    assert (
        survivors.select(F.col("doc_id").alias("id_a"))
        .join(lsh_pairs, "id_a")
        .join(
            survivors.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
        )
        .count()
        == 0
    )

    # --- leakage-safe split (r5): no clique may straddle train/eval ---
    # run the group-aware splitter over the PRE-canonical corpus, where
    # every distinct text forms a >= 6-member near-dup clique: each
    # clique must land wholly in one split, and the multi-member group
    # count must equal the clique count the canonical stage found
    from implementing_scds_in_hive_spark.operators.sampling import leakage_safe_split

    guarded = _timed(
        "leakage-safe split",
        lambda: leakage_safe_split(
            exact.select("doc_id"), lsh_pairs,
            {"train": 0.9, "val": 0.05, "test": 0.05},
        ).persist(),
        timings,
    )
    worst = (
        guarded.groupBy("split_group")
        .agg(F.countDistinct("split").alias("k"), F.count("*").alias("m"))
        .persist()
    )
    assert worst.agg(F.max("k")).first()[0] == 1, "a near-dup clique straddles splits"
    n_multi = worst.where(F.col("m") > 1).count()
    assert n_multi == n_groups, (n_multi, n_groups)
    print(f"leakage-safe split: {n_multi} cliques, every one in a single split")
    worst.unpersist()
    guarded.unpersist()
    lsh_pairs.unpersist()

    # --- decontamination (r5): planted eval leak must be caught -------
    from implementing_scds_in_hive_spark.operators.dedup import decontaminate

    # eval set = an 8-token slice of every 101st surviving doc: those
    # docs (at least) must drop; everything else with >= n tokens and no
    # shared 6-gram must survive
    long_enough = F.size(F.split("text", " ")) >= 10  # slice yields full 6-grams
    eval_set = survivors.where((F.col("doc_id") % 101 == 0) & long_enough).select(
        "doc_id", F.concat_ws(" ", F.slice(F.split("text", " "), 3, 8)).alias("text")
    )
    n_eval_sources = eval_set.count()
    decon = decontaminate(survivors, eval_set, n=6).persist()
    n_decon = _timed("decontaminate", decon.count, timings)
    leaked_kept = decon.where((F.col("doc_id") % 101 == 0) & long_enough).count()
    assert leaked_kept == 0, f"{leaked_kept} eval-source docs survived decontamination"
    assert n_surv - n_decon >= n_eval_sources  # sources + any other sharers dropped
    print(f"decontaminate: dropped {n_surv - n_decon} docs for {n_eval_sources} planted eval slices")
    survivors, n_surv = decon, n_decon

    # --- boilerplate line suppression (r14): planted banner ------------
    # Every surviving text is a single newline-free line, and survivors
    # are post-dedup (all texts distinct), so NO natural line reaches
    # the df threshold — the planted banner is the exactly-one hot line.
    from implementing_scds_in_hive_spark.operators.dedup import (
        suppress_repeated_lines,
    )

    planted_line = F.col("doc_id") % 9 == 0
    with_banner = survivors.withColumn(
        "text",
        F.when(planted_line, F.concat(F.col("text"), F.lit("\nSUBSCRIBE to our newsletter")))
        .otherwise(F.col("text")),
    )
    unbannered = suppress_repeated_lines(with_banner, min_doc_freq=5).persist()
    _timed("suppress boilerplate", unbannered.count, timings)
    n_planted = survivors.where(planted_line).count()
    assert unbannered.where(F.col("n_removed") > 0).count() == n_planted
    assert unbannered.where(planted_line & (F.col("n_removed") != 1)).count() == 0
    # suppression restores exactly the pre-banner text
    rt = unbannered.select("doc_id", "text").exceptAll(
        survivors.select("doc_id", "text")
    )
    assert rt.count() == 0, "suppression altered non-banner content"
    print(f"boilerplate: banner removed from all {n_planted} planted docs, bytes restored")
    unbannered.unpersist()

    # --- exact-substring dedup (r14): planted shared passage ----------
    # A 15-token passage of corpus-unique tokens appended to every 13th
    # doc: spans among the planted set are exactly that run, nothing
    # else changes (append shifts no earlier positions), so removal
    # must charge base + 15 tokens to every planted doc except the
    # smallest planted id, and exactly base elsewhere.
    from implementing_scds_in_hive_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    passage = " ".join(f"xq{i}" for i in range(15))
    planted_sub = F.col("doc_id") % 13 == 0
    # the per-doc zzsep<doc_id> separator keeps the construction exact:
    # without it, two planted docs sharing even a one-token natural
    # SUFFIX extend that sub-threshold match through the passage into
    # one longer span, and the victim loses suffix + 15 instead of 15
    with_passage = survivors.withColumn(
        "text",
        F.when(
            planted_sub,
            F.concat(
                F.col("text"),
                F.lit(" zzsep"),
                F.col("doc_id").cast("string"),
                F.lit(" " + passage),
            ),
        ).otherwise(F.col("text")),
    )
    base_removed = {
        r["doc_id"]: r["n_removed"]
        for r in remove_repeated_substrings(
            survivors.select("doc_id", "text"), min_len=12, k=8
        ).collect()
    }
    got_removed = {
        r["doc_id"]: r["n_removed"]
        for r in _timed(
            "exact-substring removal",
            lambda: remove_repeated_substrings(
                with_passage.select("doc_id", "text"), min_len=12, k=8
            ).collect(),
            timings,
        )
    }
    planted_ids = sorted(
        r["doc_id"] for r in survivors.where(planted_sub).select("doc_id").collect()
    )
    keeper = planted_ids[0]
    mismatch = [
        d for d in got_removed
        if got_removed[d] != base_removed[d]
        + (15 if d in set(planted_ids) and d != keeper else 0)
    ]
    assert not mismatch, f"span removal off for {mismatch[:5]}"
    print(
        f"exact-substring: {len(planted_ids) - 1} of {len(planted_ids)} planted "
        f"docs lose exactly the 15-token passage (keeper {keeper} retains it)"
    )

    # --- PII + quality gate: invariant asserts ------------------------
    clean = survivors.withColumn("text", redact_pii(F.col("text")))
    assert clean.count() == n_surv  # redaction rewrites, never drops
    toks = F.split(F.col("text"), " ")
    pred = (F.size(toks) >= 20) & ((F.length("text") / F.size(toks)) <= 12)
    kept = clean.where(pred).persist()
    n_kept = _timed("quality gate", kept.count, timings)
    assert n_kept + clean.where(~pred).count() == n_surv
    assert kept.where(~pred).count() == 0

    # --- weighted draw (r5): token-proportional, two formulations agree
    from implementing_scds_in_hive_spark.operators.dedup import portable_token_hash
    from implementing_scds_in_hive_spark.operators.sampling import sample_weighted_topk

    weighted = kept.select("doc_id", F.size(toks).alias("wt"))
    draw = sample_weighted_topk(weighted, 2000, id_col="doc_id", weight_col="wt")
    drawn_ids = {r.doc_id for r in _timed("weighted draw", draw.collect, timings)}
    assert len(drawn_ids) == 2000
    # equivalence check by a STRUCTURALLY different plan: explode one row
    # per weight unit, min-aggregate the per-copy hashes, rank — must
    # select the identical 2000 documents as the in-row array_min path
    w = F.least(F.col("wt").cast("int"), F.lit(1000))
    per_copy = (
        weighted.where(F.col("wt") >= 1)
        .select("doc_id", F.explode(F.sequence(F.lit(1), w)).alias("c"))
        .select(
            "doc_id",
            portable_token_hash(
                F.concat(
                    F.lit("w:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("c").cast("string"),
                )
            ).alias("h"),
        )
        .groupBy("doc_id")
        .agg(F.min("h").alias("pri"))
        .orderBy("pri", "doc_id")
        .limit(2000)
    )
    alt_ids = {r.doc_id for r in per_copy.collect()}
    assert alt_ids == drawn_ids, "in-row and exploded weighted draws diverged"

    # --- corpus distinct via KMV sketch: bounded-state count check ----
    from implementing_scds_in_hive_spark.operators.sketches import kmv_distinct

    est = kmv_distinct(
        kept.select(F.lit("all").alias("g"), "doc_id"), ["g"], "doc_id", k=512
    ).collect()[0]
    rel_err = abs(est.est_distinct - n_kept) / n_kept
    print(f"kmv distinct: est {est.est_distinct} vs exact {n_kept} (rel err {rel_err:.3f})")
    assert rel_err < 0.15  # k=512 -> ~4.4% expected; 3-sigma bound

    # --- training mixture: content-addressed, deterministic -----------
    # rates come from alpha-temperature balancing over the measured
    # per-source counts (alpha=0.5 tempers the en/other imbalance; the
    # smaller source caps at one epoch, en downsamples to match)
    from implementing_scds_in_hive_spark.operators.sampling import temperature_rates

    en, rest = kept.where("lang = 'en'"), kept.where("lang != 'en'")
    n_en, n_rest = en.count(), rest.count()
    rates = temperature_rates({"en": n_en, "other": n_rest}, alpha=0.5)
    print(f"temperature rates (alpha=0.5): {rates}")
    assert max(rates.values()) == 1.0  # one source always runs a full epoch
    mix_of = lambda: mixture_sample(
        [("en", en, rates["en"]), ("other", rest, rates["other"])],
        salt="stress-mix",
    )
    mix = _timed("mixture_sample", lambda: mix_of().persist(), timings)
    n_mix = mix.count()
    assert n_mix == mix_of().count()  # re-run: byte-identical membership
    by_src = {r["source"]: r["n"] for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # the capped (smallest) source runs a full epoch — no rows dropped
    capped = max(rates, key=rates.get)
    full = {"en": n_en, "other": n_rest}[capped]
    assert by_src.get(capped, 0) == full
    print(f"mixture: {by_src} (en kept {by_src.get('en',0)}/{n_en})")

    # --- splits: exact partition + determinism ------------------------
    split = assign_split(mix, {"train": 0.9, "val": 0.05, "test": 0.05}).persist()
    by_split = {
        r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(by_split.values()) == n_mix, (by_split, n_mix)
    split2 = assign_split(mix, {"train": 0.9, "val": 0.05, "test": 0.05})
    assert split.select("doc_id", "split").exceptAll(split2.select("doc_id", "split")).count() == 0
    print(f"splits: {by_split}")
    train = split.where("split = 'train'").persist()
    n_train = train.count()

    # --- chunking: arithmetic replay of the count ---------------------
    chunks = chunk_text(train, size=64, stride=56)
    n_chunks = _timed("chunk_text", chunks.count, timings)
    expected_chunks = train.select(
        (
            F.lit(1)
            + F.floor(
                (F.greatest(F.size(toks) - 64, F.lit(0)) + 55) / F.lit(56)
            ).cast("long")
        ).alias("c")
    ).agg(F.sum("c")).first()[0]
    assert n_chunks == expected_chunks, (n_chunks, expected_chunks)

    # --- packing: exact token conservation ----------------------------
    manifest = _timed(
        "pack_sequences", lambda: pack_sequences(train, seq_len=128).persist(), timings
    )
    total_tokens = train.agg(F.sum(F.size(toks))).first()[0]
    packed_tokens = manifest.agg(F.sum("slice_len")).first()[0]
    assert packed_tokens == total_tokens, (packed_tokens, total_tokens)
    per_seq = manifest.groupBy("seq_id").agg(F.sum("slice_len").alias("fill"))
    last_seq = manifest.agg(F.max("seq_id")).first()[0]
    assert per_seq.where((F.col("seq_id") != last_seq) & (F.col("fill") != 128)).count() == 0
    n_seqs = manifest.select("seq_id").distinct().count()
    print(f"packed: {total_tokens} tokens into {n_seqs} sequences of 128")

    # --- fused-plan audit: mixture→split→chunk must stay per-row ------
    # audited from a lineage-truncated checkpoint of the gated corpus:
    # a cached DataFrame's plan string still prints the BUILD plan
    # inside its InMemoryRelation block, so auditing the full lineage
    # would count upstream (already-materialized) dedup exchanges that
    # never re-execute. From the storage boundary on, the composition
    # must add ZERO exchanges — mixture is a union of per-row filters,
    # split assignment a per-row hash, chunking a projection + explode.
    audit_base = kept.localCheckpoint(eager=True)
    fused = chunk_text(
        assign_split(
            mixture_sample(
                [
                    ("en", audit_base.where("lang = 'en'"), 0.5),
                    ("other", audit_base.where("lang != 'en'"), 1.0),
                ],
                salt="stress-mix",
            ),
            {"train": 0.9, "val": 0.05, "test": 0.05},
        ).where("split = 'train'"),
        size=64,
        stride=56,
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 0, f"mixture→split→chunk grew {n_exchanges} exchanges:\n{plan}"
    print("fused mixture→split→chunk plan: 0 exchanges (per-row end-to-end)")

    print(json.dumps({
        "sf_dir": sf_dir,
        "n_inflated": n_inflated,
        "n_exact_dedup": n_exact,
        "near_dup_pairs": n_lsh,
        "n_after_near_dedup": n_surv,
        "n_after_quality": n_kept,
        "mixture": by_src,
        "splits": by_split,
        "n_train": n_train,
        "n_chunks": n_chunks,
        "packed_tokens": packed_tokens,
        "n_sequences": n_seqs,
        "timings_sec": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--stress"]
    if "--stress" in sys.argv[1:]:
        stress_main(args[0] if args else "/root/testdata/sf0.1")
    else:
        main()
