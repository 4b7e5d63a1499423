"""Randomized multi-writer harness for the durable index lifecycle
(r12 — the index-store counterpart of tests/test_concurrency_harness.py,
exercising the `_index_lock` serialization the r11 ADVICE asked for).

Threads interleave `append_minhash_index`, `compact_index`,
`maintain_index` and lock-free probes against ONE saved MinHash index.
The lock serializes the writers (an append can no longer land inside
compaction's stage->commit window), so the invariant is simple and
strong: after the threads join, the stored index must contain EXACTLY
the seed corpus plus every batch whose append RETURNED (no lost
appends, no duplicated bucket generations), and a probe against the
stored index must return byte-identical pairs to the same probe against
a freshly built in-memory index over the same union corpus."""

from __future__ import annotations

import random
import threading

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    incremental_minhash_pairs,
    portable_minhash_index,
)
from implementing_scds_in_hive_spark.operators.index_store import (
    append_minhash_index,
    compact_index,
    incremental_minhash_pairs_stored,
    load_minhash_index,
    maintain_index,
    save_minhash_index,
)
from implementing_scds_in_hive_spark.sources.registry import load_table


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in df.collect()
    )


@pytest.mark.stress  # multi-minute randomized sweep; the rebuild-swap liveness test stays default
@pytest.mark.parametrize("seed", [0, 1])
def test_index_multi_writer_appends_compactions_and_probes(
    spark, sf_dir, tmp_path, seed
):
    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 4 == 0)
    root = str(tmp_path / "mh")
    save_minhash_index(
        portable_minhash_index(corpus, n=3, num_perm=32, bands=8),
        "t_mhc",
        root,
        n_buckets=16,
        params={"num_perm": 32, "bands": 8},
    )

    # each (tid, j) append gets a disjoint id range (ids are the dedup
    # identity — the caller's uniqueness contract)
    def batch_docs(tid, j):
        return d.where(F.col("doc_id") % 4 == tid + 1).limit(12).select(
            (F.col("doc_id") + (tid * 10 + j) * 1_000_000).alias("doc_id"),
            "text",
        )

    appended: list = []  # (tid, j) of appends that RETURNED
    errors: list = []

    class W:
        def __init__(self, tid):
            self.tid = tid
            self.rng = random.Random(seed * 100 + tid)

        def run(self):
            try:
                for j in range(4):
                    op = self.rng.choices(
                        ["append", "compact", "maintain", "probe"],
                        weights=[45, 20, 15, 20],
                    )[0]
                    if op == "append":
                        ix = portable_minhash_index(
                            batch_docs(self.tid, j), n=3, num_perm=32, bands=8
                        )
                        append_minhash_index(spark, root, ix)
                        appended.append((self.tid, j))
                    elif op == "compact":
                        try:
                            compact_index(spark, root)
                        except (RuntimeError, TimeoutError):
                            pass  # abort/lock-timeout: must leave no trace
                    elif op == "maintain":
                        try:
                            maintain_index(
                                spark, root, sweep_grace_seconds=600.0
                            )
                        except (RuntimeError, TimeoutError):
                            pass
                    else:
                        # lock-free reader: must never crash mid-compact
                        probe = portable_minhash_index(
                            batch_docs(self.tid, 99), n=3, num_perm=32,
                            bands=8,
                        )
                        incremental_minhash_pairs_stored(
                            spark, root, probe, threshold=0.5
                        ).count()
            except Exception as e:  # pragma: no cover
                errors.append((self.tid, repr(e)))

    ws = [W(t) for t in range(3)]
    ts = [threading.Thread(target=w.run) for w in ws]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, errors

    # exactly the seed corpus + every returned append, nothing else
    docs, _, _ = load_minhash_index(spark, root)
    got_ids = {r["did"] for r in docs.select("did").collect()}
    want = portable_minhash_index(corpus, n=3, num_perm=32, bands=8)
    expect_ids = {r["did"] for r in want.select("did").collect()}
    for tid, j in appended:
        expect_ids |= {
            r["did"]
            for r in portable_minhash_index(
                batch_docs(tid, j), n=3, num_perm=32, bands=8
            ).select("did").collect()
        }
    assert got_ids == expect_ids, (
        f"lost={sorted(expect_ids - got_ids)[:5]}, "
        f"phantom={sorted(got_ids - expect_ids)[:5]}"
    )

    # probe fidelity: stored-index pairs == in-memory pairs over the
    # SAME union corpus for a fresh batch
    probe_ix = portable_minhash_index(
        batch_docs(0, 55), n=3, num_perm=32, bands=8
    ).localCheckpoint(eager=True)
    stored = _pairs(
        incremental_minhash_pairs_stored(spark, root, probe_ix, threshold=0.5)
    )
    union_ix = docs.select("did", "sh", "bb").localCheckpoint(eager=True)
    mem = _pairs(
        incremental_minhash_pairs(union_ix, probe_ix, threshold=0.5)
    )
    assert stored == mem


def test_probes_survive_concurrent_rebuild_catalog_swap(spark, sf_dir, tmp_path):
    """r12 hunt (CONFIRMED by a rebuild-loop repro): the rebuild used to
    DROP the live catalog name for the entire bucketed write, so a
    same-session lock-free probe registering the tables mid-rebuild
    crashed with TABLE_OR_VIEW_NOT_FOUND. The temp-name write + DROP->
    RENAME swap (~ms window) plus the registration retry must keep
    every probe alive through a continuous rebuild loop."""
    import threading

    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 4 == 0)
    root = str(tmp_path / "mh_swap")
    ix = portable_minhash_index(corpus, n=3, num_perm=32, bands=8)
    ix = ix.localCheckpoint(eager=True)
    save_minhash_index(ix, "t_mhswap", root, n_buckets=16, params={})
    probe_ix = portable_minhash_index(
        d.where(F.col("doc_id") % 4 == 1).limit(8), n=3, num_perm=32, bands=8
    ).localCheckpoint(eager=True)

    stop = {"v": False}
    errors: list = []

    def rebuilder():
        try:
            while not stop["v"]:
                save_minhash_index(
                    ix, "t_mhswap", root, n_buckets=16, params={}
                )
        except Exception as e:  # pragma: no cover
            errors.append(("rebuild", repr(e)))

    def prober():
        try:
            for _ in range(15):
                incremental_minhash_pairs_stored(
                    spark, root, probe_ix, threshold=0.5
                ).count()
        except Exception as e:
            errors.append(("probe", repr(e)))

    t1 = threading.Thread(target=rebuilder)
    t2 = threading.Thread(target=prober)
    t1.start(); t2.start()
    t2.join(timeout=600); stop["v"] = True; t1.join(timeout=600)
    assert not errors, errors
