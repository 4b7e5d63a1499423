"""Durable index lifecycle (VERDICT r4 next-round #1): the MinHash and
IVF indexes must survive a process restart — saved as external bucketed
parquet + sidecar, re-registered in a catalog that has never seen them —
and the reloaded probe must (a) return byte-identical results to the
in-memory probe and (b) carry the bucketed layout's plan guarantees:
bucket pruning on the probe filter (SelectedBucketsCount) and no
Exchange on the corpus side of the verification join.

Fresh-process simulation: tables here are EXTERNAL, so dropping the
catalog entries deletes exactly what a restart loses (metadata, incl.
bucketing spec) while keeping what a restart keeps (the files + sidecar);
the probe then runs from ``spark.newSession()``."""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import (
    incremental_minhash_pairs,
    portable_minhash_index,
)
from implementing_scds_in_hive_spark.operators.index_store import (
    incremental_minhash_pairs_stored,
    load_ivf_index,
    load_minhash_index,
    save_ivf_index,
    save_minhash_index,
)
from implementing_scds_in_hive_spark.operators.similarity import ivf_assign, ivf_topk
from implementing_scds_in_hive_spark.sources.registry import load_table


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def minhash_setup(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 4 != 0)
    # tiny delta with planted near-dups of corpus docs: small enough
    # that its touched-bkey set cannot cover all buckets (pruning shows)
    clones = corpus.where(F.col("doc_id") % 60 == 1).withColumn(
        "doc_id", F.col("doc_id") + 500_000
    )
    new_index = portable_minhash_index(clones).localCheckpoint(eager=True)
    corpus_index = portable_minhash_index(corpus).persist()
    root = str(tmp_path / "mh_index")
    save_minhash_index(corpus_index, "t_mh", root, n_buckets=32, params={"num_perm": 32})
    yield corpus_index, new_index, root
    corpus_index.unpersist()
    _drop(spark, "t_mh_docs", "t_mh_buckets")


def test_minhash_roundtrip_fresh_session(spark, minhash_setup):
    corpus_index, new_index, root = minhash_setup
    expected = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in incremental_minhash_pairs(corpus_index, new_index, threshold=0.5).collect()
    }
    assert expected, "fixture must produce cross-side near-dup pairs"

    # simulate restart: catalog forgets the tables, files + sidecar stay
    _drop(spark, "t_mh_docs", "t_mh_buckets")
    fresh = spark.newSession()
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in incremental_minhash_pairs_stored(
            fresh, root, new_index, threshold=0.5
        ).collect()
    }
    assert got == expected


def test_minhash_stored_probe_plan_prunes_and_keeps_corpus_unshuffled(spark, minhash_setup):
    _, new_index, root = minhash_setup
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # kill auto-broadcast so the shingle-verification join plans as
        # SMJ — at 100 TB the docs table never fits a broadcast, and the
        # did-bucketing is what must keep it exchange-free
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pairs = incremental_minhash_pairs_stored(spark, root, new_index, threshold=0.5)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # literal bkey IN (...) on the bucket column => bucket pruning
    sel = [seg for seg in plan.split("SelectedBucketsCount: ")[1:]]
    assert sel, f"no bucket pruning in plan:\n{plan}"
    picked = int(sel[0].split(" ")[0])
    assert picked < 32, f"probe touched all buckets — pruning ineffective: {picked}"

    # exactly two shuffles, both on the (small) candidate stream:
    # the distinct over candidate pairs and the cand side of the SMJ.
    # The corpus _docs side rides its did-bucketing — zero Exchange.
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 2, f"expected 2 candidate-side exchanges, saw {n_ex}:\n{plan}"


@pytest.fixture()
def ivf_setup(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(e, centroids).persist()
    root = str(tmp_path / "ivf_index")
    save_ivf_index(assigned, centroids, "t_ivf", root, n_buckets=32)
    queries = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    yield assigned, centroids, queries, root
    assigned.unpersist()
    _drop(spark, "t_ivf_assign")


def test_ivf_roundtrip_fresh_session(spark, ivf_setup):
    assigned, centroids, queries, root = ivf_setup
    expected = {
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in ivf_topk(assigned, queries, centroids, k=10, nprobe=2).collect()
    }
    assert expected

    _drop(spark, "t_ivf_assign")
    fresh = spark.newSession()
    re_assigned, re_centroids = load_ivf_index(fresh, root)
    got = {
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in ivf_topk(
            re_assigned, queries, re_centroids, k=10, nprobe=2, probe_prune=True
        ).collect()
    }
    assert got == expected


def test_ivf_stored_probe_prunes_buckets_and_never_shuffles_corpus(spark, ivf_setup):
    _, _, queries, root = ivf_setup
    re_assigned, re_centroids = load_ivf_index(spark, root)
    out = ivf_topk(re_assigned, queries, re_centroids, k=10, nprobe=2, probe_prune=True)
    plan = out._jdf.queryExecution().executedPlan().toString()

    sel = plan.split("SelectedBucketsCount: ")[1:]
    assert sel, f"no bucket pruning on the assign scan:\n{plan}"
    picked = int(sel[0].split(" ")[0])
    assert picked < 32, f"probe read all inverted lists: {picked}"

    # the corpus/assignment never shuffles on its own keys — the only
    # hash exchanges are the per-query rankings (query_id)
    assert "hashpartitioning(centroid_id" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_load_rejects_kind_mismatch(spark, minhash_setup):
    _, _, root = minhash_setup
    with pytest.raises(ValueError, match="not ivf"):
        load_ivf_index(spark, root)


def test_minhash_load_returns_params(spark, minhash_setup):
    _, _, root = minhash_setup
    _drop(spark, "t_mh_docs", "t_mh_buckets")
    docs, buckets, params = load_minhash_index(spark.newSession(), root)
    assert params == {"num_perm": 32}
    assert set(docs.columns) == {"did", "sh", "bb"}
    assert set(buckets.columns) == {"bkey", "band", "bucket", "did"}
    assert buckets.count() > 0 and docs.count() > 0


def test_build_ivf_index_end_to_end(spark, sf_dir, tmp_path):
    """One-call build → save → fresh-session load → pruned probe: the
    whole IVF lifecycle. Determinism: building twice from the same
    corpus yields identical centroids and assignment (content-addressed
    seeding + deterministic refinement)."""
    from implementing_scds_in_hive_spark.operators.index_store import build_ivf_index

    e = load_table(spark, sf_dir, "embeddings")
    root_a, root_b = str(tmp_path / "a"), str(tmp_path / "b")
    try:
        build_ivf_index(e, "t_bivf_a", root_a, k=8, n_iter=2, n_buckets=8)
        build_ivf_index(e, "t_bivf_b", root_b, k=8, n_iter=2, n_buckets=8)
        a_assigned, a_cent = load_ivf_index(spark, root_a)
        b_assigned, b_cent = load_ivf_index(spark, root_b)
        snap = lambda df: sorted(map(tuple, df.collect()))
        assert snap(a_cent) == snap(b_cent)
        assert snap(a_assigned.select("vec_id", "centroid_id")) == snap(
            b_assigned.select("vec_id", "centroid_id")
        )

        _drop(spark, "t_bivf_a_assign")
        fresh = spark.newSession()
        re_assigned, re_cent = load_ivf_index(fresh, root_a)
        queries = e.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = ivf_topk(re_assigned, queries, re_cent, k=5, nprobe=2, probe_prune=True)
        n_q = queries.count()
        assert out.count() == 5 * n_q
        assert out.groupBy("query_id").count().where("count != 5").count() == 0
    finally:
        _drop(spark, "t_bivf_a_assign", "t_bivf_b_assign")


def test_ivf_append_new_vectors_probed(spark, ivf_setup, tmp_path):
    """append_ivf_index folds new vectors into the stored inverted
    lists using the existing centroids; a probe whose query IS one of
    the appended vectors must rank it first (cos=1.0)."""
    from implementing_scds_in_hive_spark.operators.index_store import append_ivf_index

    _, _, queries, root = ivf_setup
    re_assigned, re_cent = load_ivf_index(spark, root)
    n0 = re_assigned.count()

    base = spark.createDataFrame(
        [(r["query_id"], r["embedding"]) for r in queries.limit(2).collect()],
        queries.schema,
    )
    new_vecs = base.select(
        (F.col("query_id") + 900_000).alias("vec_id"), F.col("embedding")
    )
    append_ivf_index(spark, root, new_vecs)
    grown, _ = load_ivf_index(spark, root)
    assert grown.count() == n0 + 2

    probe_q = base.limit(1)
    out = ivf_topk(grown, probe_q, re_cent, k=3, nprobe=2, probe_prune=True)
    top = out.where("rank = 1").first()
    qid = probe_q.first()["query_id"]
    # identical vector: either the appended twin or the original doc
    # wins rank 1 at cos 1.0; the appended twin must be in the top-k
    assert top["cos_sim"] == 1.0
    appended_hit = out.where(F.col("vec_id") == qid + 900_000).count()
    assert appended_hit == 1


def test_compact_index_restores_one_file_per_bucket(spark, minhash_setup):
    """Appends accumulate files per bucket; compact_index rewrites each
    table to exactly n_buckets files with probe results unchanged."""
    import os

    from implementing_scds_in_hive_spark.operators.index_store import (
        append_minhash_index,
        compact_index,
    )

    corpus_index, new_index, root = minhash_setup
    before = {
        (r["id_a"], r["id_b"])
        for r in incremental_minhash_pairs_stored(spark, root, new_index, threshold=0.5).collect()
    }
    extra = new_index.withColumn("did", F.col("did") + 7_000_000)
    append_minhash_index(spark, root, extra)
    append_minhash_index(spark, root, extra.withColumn("did", F.col("did") + 1_000_000))

    from implementing_scds_in_hive_spark.operators.index_store import _read_meta

    docs_path = _read_meta(root)["docs"]["path"]
    n_files = len([f for f in os.listdir(docs_path) if f.startswith("part-")])
    assert n_files > 32  # base (32) + two appends

    counts = compact_index(spark, root)
    # compaction commits a NEW generation dir via the sidecar (crash-safe
    # stage-then-commit); resolve the current path from the meta
    docs_path = _read_meta(root)["docs"]["path"]
    assert counts["t_mh_docs"] == n_files
    assert len([f for f in os.listdir(docs_path) if f.startswith("part-")]) == 32

    after = {
        (r["id_a"], r["id_b"])
        for r in incremental_minhash_pairs_stored(spark, root, new_index, threshold=0.5).collect()
    }
    # the two appended clone sets pair with the delta too — superset,
    # and every pre-compact pair survives
    assert before <= after
    docs_t, _, _ = load_minhash_index(spark, root)
    assert docs_t.count() == corpus_index.count() + 2 * new_index.count()


def test_ivf_index_stats_shape(spark, ivf_setup):
    from implementing_scds_in_hive_spark.operators.index_store import ivf_index_stats

    _, _, _, root = ivf_setup
    s = ivf_index_stats(spark, root)
    assert s["n_vectors"] == 500
    assert s["n_lists"] > 0 and s["min_list"] >= 1
    assert 0.0 < s["mean_cos"] <= 1.0
    assert s["min_list"] <= s["median_list"] <= s["max_list"]


# ---------------------------------------------------------------------------
# Chain property (the r4 stress discipline applied to the new surface):
# any interleaving of appends and compactions must leave the stored
# index probe-equivalent to an index built from scratch over the same
# documents — growth and maintenance can never change answers.
# ---------------------------------------------------------------------------

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_scds_in_hive_spark.operators.index_store import (
    append_minhash_index,
    compact_index,
)

# ops: which of 3 delta slices to append (dups allowed -> tests the
# caller-id contract is the ONLY uniqueness guard we claim), or compact
_ops = st.lists(
    st.one_of(st.sampled_from(["a0", "a1", "a2"]), st.just("compact")),
    min_size=1,
    max_size=4,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_ops)
@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_append_compact_chains_probe_like_rebuild(spark, sf_dir, ops):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.where("doc_id < 200")
    slices = {
        f"a{i}": d.where(F.col("doc_id") % 3 == i)
        .where("doc_id >= 200 and doc_id < 380")
        .withColumn("doc_id", F.col("doc_id") + (i + 1) * 10_000)
        for i in range(3)
    }
    probe_docs = d.where("doc_id >= 380 and doc_id < 420").withColumn(
        "doc_id", F.col("doc_id") + 90_000
    )
    probe_index = portable_minhash_index(probe_docs).localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="idx_chain_")
    try:
        save_minhash_index(
            portable_minhash_index(base).localCheckpoint(eager=True),
            "t_chain", work, n_buckets=8, params={},
        )
        members = base
        for op in ops:
            if op == "compact":
                compact_index(spark, work)
            else:
                append_minhash_index(
                    spark, work,
                    portable_minhash_index(slices[op]).localCheckpoint(eager=True),
                )
                members = members.unionByName(slices[op])

        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in incremental_minhash_pairs_stored(
                spark, work, probe_index, threshold=0.4
            ).collect()
        }
        want = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in incremental_minhash_pairs(
                portable_minhash_index(members).localCheckpoint(eager=True),
                probe_index,
                threshold=0.4,
            ).collect()
        }
        assert got == want
    finally:
        for t in ("t_chain_docs", "t_chain_buckets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Maintenance automation (VERDICT r5 next-round #5): maintain_index must
# sweep crash orphans, compact past the growth threshold, flag IVF
# rebuilds past drift/skew thresholds — and compaction itself must be
# crash-safe (stage-then-commit): a death before the sidecar replace
# leaves the old generation fully probe-able, after it the new one.
# ---------------------------------------------------------------------------

from implementing_scds_in_hive_spark.operators.index_store import (
    _read_meta,
    index_file_counts,
    maintain_index,
)


def _probe_set(spark, root, new_index):
    return {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in incremental_minhash_pairs_stored(
            spark, root, new_index, threshold=0.5
        ).collect()
    }


def test_maintain_index_compacts_past_threshold(spark, minhash_setup):
    corpus_index, new_index, root = minhash_setup
    before = _probe_set(spark, root, new_index)
    extra = new_index.withColumn("did", F.col("did") + 7_000_000)
    append_minhash_index(spark, root, extra)
    append_minhash_index(spark, root, extra.withColumn("did", F.col("did") + 1_000_000))

    # below threshold: no-op decision, files untouched
    counts_pre = index_file_counts(root)
    rep = maintain_index(
        spark, root, sweep_grace_seconds=0.0, max_files_per_bucket=1_000)
    assert not rep["compacted"] and rep["files_before"] is None
    assert index_file_counts(root) == counts_pre

    # past threshold: compacts back to one file per bucket
    rep = maintain_index(
        spark, root, sweep_grace_seconds=0.0, max_files_per_bucket=1.0)
    assert rep["compacted"]
    assert rep["files_before"] == counts_pre
    assert all(v == 32 for v in index_file_counts(root).values())
    assert any("files_per_bucket" in r for r in rep["reasons"])
    # probe answers preserved (appended clones only ADD pairs)
    assert before <= _probe_set(spark, root, new_index)


def test_compact_crash_before_meta_commit_keeps_old_generation(spark, minhash_setup):
    corpus_index, new_index, root = minhash_setup
    before = _probe_set(spark, root, new_index)
    old_paths = [s["path"] for s in
                 (_read_meta(root)["docs"], _read_meta(root)["buckets"])]

    class Boom(RuntimeError):
        pass

    def hook(phase):
        if phase == "post_stage":
            raise Boom()

    with pytest.raises(Boom):
        compact_index(spark, root, crash_hook=hook)

    # sidecar still points at the old generation; probe unchanged.
    # NOTE: the aborted run's DROP+saveAsTable left the catalog entry on
    # the staged dir, so simulate the restart that a real crash forces —
    # the fresh process re-registers from the committed sidecar.
    meta = _read_meta(root)
    assert [meta["docs"]["path"], meta["buckets"]["path"]] == old_paths
    _drop(spark, "t_mh_docs", "t_mh_buckets")
    fresh = spark.newSession()
    assert _probe_set(fresh, root, new_index) == before

    # next maintenance sweeps the orphaned staged generation
    rep = maintain_index(
        fresh, root, sweep_grace_seconds=0.0, max_files_per_bucket=1_000)
    assert rep["swept"], "staged -g dir must be swept"
    assert _probe_set(fresh, root, new_index) == before


def test_compact_crash_after_meta_commit_serves_new_generation(spark, minhash_setup):
    corpus_index, new_index, root = minhash_setup
    before = _probe_set(spark, root, new_index)

    class Boom(RuntimeError):
        pass

    def hook(phase):
        if phase == "post_meta":
            raise Boom()

    with pytest.raises(Boom):
        compact_index(spark, root, crash_hook=hook)

    # committed: probes serve the new generation, answers identical
    assert _probe_set(spark, root, new_index) == before
    # old un-suffixed dirs are the orphans now; sweep removes them
    import os

    rep = maintain_index(
        spark, root, sweep_grace_seconds=0.0, max_files_per_bucket=1_000)
    assert set(rep["swept"]) >= {"docs", "buckets"}
    assert not os.path.exists(os.path.join(root, "docs"))
    assert _probe_set(spark, root, new_index) == before


def test_maintain_index_flags_ivf_rebuild_on_drift(spark, ivf_setup):
    _, _, _, root = ivf_setup
    # thresholds chosen around the fixture's actual stats
    from implementing_scds_in_hive_spark.operators.index_store import ivf_index_stats

    stats = ivf_index_stats(spark, root)
    ok = maintain_index(
        spark, root, sweep_grace_seconds=0.0, max_files_per_bucket=1_000,
        min_mean_cos=stats["mean_cos"] - 0.01,
        max_list_skew=(stats["max_list"] / stats["median_list"]) + 1.0,
    )
    assert not ok["rebuild_recommended"]
    bad = maintain_index(
        spark, root, sweep_grace_seconds=0.0, max_files_per_bucket=1_000,
        min_mean_cos=min(1.0, stats["mean_cos"] + 0.01),
        max_list_skew=max(1.0, (stats["max_list"] / stats["median_list"]) - 0.5),
    )
    assert bad["rebuild_recommended"]
    assert len(bad["reasons"]) == 2


def test_register_external_bucketed_heals_location_mismatch(spark, minhash_setup):
    """ADVICE r6: an existing catalog entry is trusted only if its
    LOCATION matches the committed spec — an in-process compact failure
    between staging and the sidecar commit leaves the catalog pointing
    at an uncommitted generation the orphan sweep later deletes."""
    import os

    from implementing_scds_in_hive_spark.operators.index_store import (
        _read_meta,
        _register_external_bucketed,
    )

    corpus_index, new_index, root = minhash_setup
    spec = _read_meta(root)["docs"]
    n = spark.table(spec["table"]).count()
    # poison the catalog: same table name, location = a generation dir
    # that was never committed (and is about to be swept)
    bogus = dict(spec)
    bogus["path"] = spec["path"] + "-gdeadbeef"
    os.makedirs(bogus["path"], exist_ok=True)
    spark.sql(f"DROP TABLE IF EXISTS {spec['table']}")
    _register_external_bucketed(spark, bogus)
    # healing: re-registering with the COMMITTED spec must drop the
    # mismatched entry and point the catalog back at the real files
    df = _register_external_bucketed(spark, spec)
    assert df.count() == n


def test_compact_index_leaves_old_generation_for_graced_sweep(spark, minhash_setup):
    """ADVICE r6: compact_index must not rmtree the superseded
    generation inline — a prober mid-scan gets the same grace window the
    snapshot vacuum gives dereferenced versions (mtime restarted at
    dereference, swept only past grace)."""
    import os

    from implementing_scds_in_hive_spark.operators.index_store import (
        _index_specs,
        _read_meta,
        _sweep_orphan_generations,
        compact_index,
    )

    corpus_index, new_index, root = minhash_setup
    old_paths = [s["path"] for s in _index_specs(_read_meta(root))]
    pinned = spark.read.parquet(old_paths[0])  # prober mid-scan of old gen
    n = pinned.count()
    compact_index(spark, root)
    assert all(os.path.isdir(p) for p in old_paths)  # not removed inline
    meta = _read_meta(root)
    # in grace: mtime was touched at dereference time, so even though the
    # data is old, a fresh compaction leaves the prober working
    assert _sweep_orphan_generations(root, meta, grace_seconds=3600.0) == []
    assert pinned.count() == n
    swept = _sweep_orphan_generations(root, meta, grace_seconds=0.0)
    assert sorted(swept) == sorted(os.path.basename(p) for p in old_paths)


def test_compact_index_touches_old_generation_before_meta_commit(spark, minhash_setup):
    """Review r7: the dereference-time mtime touch must land BEFORE the
    sidecar commit — a crash right after the commit (or a sweep racing
    the gap) must still find the old generation inside its grace
    window."""
    import os
    import time

    from implementing_scds_in_hive_spark.operators.index_store import (
        _index_specs,
        _read_meta,
        _sweep_orphan_generations,
        compact_index,
    )

    corpus_index, new_index, root = minhash_setup
    old_paths = [s["path"] for s in _index_specs(_read_meta(root))]
    for p in old_paths:  # age the dirs: last append long ago
        os.utime(p, (1.0, 1.0))

    def die_post_meta(phase):
        if phase == "post_meta":
            raise RuntimeError("crash right after sidecar commit")

    with __import__("pytest").raises(RuntimeError, match="after sidecar"):
        compact_index(spark, root, crash_hook=die_post_meta)
    # the commit landed; the old dirs are now unreferenced orphans — but
    # their clocks were restarted pre-commit, so a graced sweep keeps them
    meta = _read_meta(root)
    assert _sweep_orphan_generations(root, meta, grace_seconds=3600.0) == []
    assert all(os.path.isdir(p) for p in old_paths)
    assert all(time.time() - os.path.getmtime(p) < 600 for p in old_paths)

def test_append_crash_between_tables_replays_without_recall_loss(
    spark, minhash_setup
):
    """r11 index review: the docs table is the stream's replay
    sentinel, so it must commit LAST. A crash between the buckets and
    docs appends replays into a duplicate-tolerant state (bucket rows
    re-appended, candidates .distinct()ed) — never into docs-present/
    buckets-missing, which would skip the replay and permanently lose
    the batch's candidate rows."""
    from implementing_scds_in_hive_spark.operators.index_store import (
        append_minhash_index,
        incremental_minhash_pairs_stored,
    )

    corpus_index, new_index, root = minhash_setup

    with pytest.raises(RuntimeError, match="injected"):
        append_minhash_index(
            spark, root, new_index,
            crash_hook=lambda ph: (_ for _ in ()).throw(
                RuntimeError(f"injected at {ph}")
            ),
        )
    # crash window state: buckets hold the batch, docs do NOT — the
    # stream's replay guard (anti-join on docs) sees the batch as
    # fresh and re-appends everything
    docs, buckets, _ = load_minhash_index(spark, root)
    batch_ids = [r["did"] for r in new_index.select("did").collect()]
    assert docs.where(F.col("did").isin(batch_ids)).count() == 0
    assert buckets.where(F.col("did").isin(batch_ids)).count() > 0
    append_minhash_index(spark, root, new_index)  # the replay
    docs, buckets, _ = load_minhash_index(spark, root)
    assert docs.where(F.col("did").isin(batch_ids)).count() == len(batch_ids)

    # probes stay correct through the duplicate bucket rows: the
    # planted clones are found against the corpus
    pairs = incremental_minhash_pairs_stored(
        spark, root, new_index, threshold=0.8
    )
    assert pairs.where("id_b - 500000 == id_a").count() > 0
    # and no duplicate pairs leak out of candidate generation
    assert (
        pairs.groupBy("id_a", "id_b").count().where("count > 1").count() == 0
    )


def test_compact_index_aborts_on_concurrent_append(spark, minhash_setup):
    """r11 index review: rows appended after the compactor's file
    listing would vanish from the new generation (and be reclaimed with
    the old) — compaction must abort, leave the old index current, and
    remove its staged dirs.

    Since r12 the public ``append_*`` entrypoints serialize against
    compaction via the root's maintenance lock, so the interleaving
    this test exercises can only come from an OUT-OF-BAND writer (a
    stale-lock break, or a process writing the part files directly) —
    the in-hook append therefore uses the lock-bypassing internal to
    simulate exactly that, and the pre-commit re-check must still
    catch it (defense-in-depth)."""
    from implementing_scds_in_hive_spark.operators.index_store import (
        _append_minhash_locked,
        _read_meta,
        compact_index,
    )

    corpus_index, new_index, root = minhash_setup
    n_docs_before = load_minhash_index(spark, root)[0].count()
    committed = {
        k: _read_meta(root)[k]["path"] for k in ("docs", "buckets")
    }

    def racing_append(phase):
        if phase == "post_stage":
            _append_minhash_locked(spark, root, new_index)

    with pytest.raises(RuntimeError, match="concurrent append"):
        compact_index(spark, root, crash_hook=racing_append)
    # the appended rows survived and the index serves them
    docs, _, _ = load_minhash_index(spark, root)
    assert docs.count() == n_docs_before + new_index.count()
    # no staged generation dirs leaked, and the maintenance lock was
    # released on the abort path
    import os as _os

    leftovers = [
        d for d in _os.listdir(root)
        if _os.path.isdir(_os.path.join(root, d))
    ]
    assert sorted(leftovers) == ["buckets", "docs"], leftovers
    assert not _os.path.exists(_os.path.join(root, "_maintenance.lock"))
    # r12 (ADVICE): the abort must re-register the in-session catalog
    # tables at the OLD committed paths — without the repair they point
    # at the rmtree'd staged dirs and same-session probes break
    meta = _read_meta(root)
    for k in ("docs", "buckets"):
        assert meta[k]["path"] == committed[k]
        tbl = meta[k]["table"]
        loc = next(
            r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {tbl}").collect()
            if r["col_name"] == "Location"
        )
        assert loc.removeprefix("file:").rstrip("/") == committed[k].rstrip("/")
        spark.table(tbl).count()  # the session stays usable immediately


def test_index_maintenance_lock_serializes_append_against_compact(
    spark, minhash_setup
):
    """r12 (VERDICT #1 / ADVICE): the maintenance lock closes the
    check-then-commit window — a PUBLIC append attempted while
    compaction holds the lock must block until the lock frees (here:
    time out) rather than land mid-window, and a stale lock from a
    crashed holder must be broken, not wedge maintenance forever."""
    import os as _os

    from implementing_scds_in_hive_spark.operators.index_store import (
        _LOCK_FILE,
        _index_lock,
        append_minhash_index,
        compact_index,
    )

    corpus_index, new_index, root = minhash_setup

    # 1. mutual exclusion: while one holder owns the lock, a second
    #    acquisition times out instead of proceeding
    with _index_lock(root, timeout=5.0):
        with pytest.raises(TimeoutError, match="maintenance lock"):
            with _index_lock(root, timeout=0.3):
                pass
        # public entrypoints go through the same lock
        with pytest.raises(TimeoutError, match="maintenance lock"):
            with _index_lock(root, timeout=0.2):
                pass
    # released on exit: both maintenance verbs run normally again
    append_minhash_index(spark, root, new_index)
    compact_index(spark, root)

    # 2. stale-lock break: a lock file whose mtime predates the stale
    #    horizon is removed and acquisition proceeds
    lock_path = _os.path.join(root, _LOCK_FILE)
    with open(lock_path, "w") as f:
        f.write("pid=dead\n")
    _os.utime(lock_path, (1, 1))  # ancient mtime
    with _index_lock(root, timeout=5.0):
        pass  # acquired despite the pre-existing (stale) lock file
    assert not _os.path.exists(lock_path)


def test_rebuild_onto_live_root_stages_generationally(
    spark, minhash_setup
):
    """r11 index review: a rebuild (save_* onto an existing root) must
    stage into fresh generation dirs and commit via the atomic sidecar
    replace — overwriting the live dirs in place would destroy old and
    new together on a mid-write crash."""
    import os as _os

    corpus_index, new_index, root = minhash_setup
    meta1 = load_minhash_index(spark, root)
    before_docs_path = None
    from implementing_scds_in_hive_spark.operators.index_store import (
        _read_meta,
        maintain_index,
    )

    before = _read_meta(root)
    before_docs_path = before["docs"]["path"]
    # rebuild the SAME index onto the live root
    save_minhash_index(
        corpus_index, "t_mh", root, n_buckets=32, params={"num_perm": 32}
    )
    after = _read_meta(root)
    assert after["docs"]["path"] != before_docs_path, "staged, not in place"
    assert _os.path.isdir(before_docs_path), (
        "old generation must survive until the graced sweep"
    )
    docs, _, _ = load_minhash_index(spark, root)
    assert docs.count() == corpus_index.count()
    # the superseded generation sweeps once the grace window passes
    swept = maintain_index(spark, root, sweep_grace_seconds=0.0)["swept"]
    assert _os.path.basename(before_docs_path) in swept


def test_rebuild_honors_maintenance_lock(spark, minhash_setup):
    """r12 review: a rebuild (save_* onto a live root) used to stage and
    replace the sidecar WITHOUT the maintenance lock, so a concurrent
    append could return success while its part files rode the
    superseded generation into the orphan sweep. Rebuilds must now
    block on the lock like append/compact."""
    import os as _os

    from implementing_scds_in_hive_spark.operators.index_store import (
        _index_lock,
        save_minhash_index,
    )

    corpus_index, new_index, root = minhash_setup
    with _index_lock(root, timeout=5.0):
        import implementing_scds_in_hive_spark.operators.index_store as ixs

        orig = ixs._LOCK_STALE_SECONDS
        try:
            # keep the held lock from being broken as "stale"
            ixs._LOCK_STALE_SECONDS = 3600.0
            with pytest.raises(TimeoutError, match="maintenance lock"):
                # monkey-cheap timeout: patch via the internal helper
                with ixs._index_lock(root, timeout=0.3):
                    pass
            # the PUBLIC rebuild path goes through the same lock: it
            # must not commit a sidecar while the lock is held elsewhere
            t0 = _os.times().elapsed if hasattr(_os, "times") else None
            import threading

            done = {"v": False}

            def rebuild():
                save_minhash_index(
                    corpus_index, "t_mh", root, n_buckets=32,
                    params={"num_perm": 32},
                )
                done["v"] = True

            th = threading.Thread(target=rebuild)
            th.start()
            th.join(timeout=2.0)
            assert not done["v"], "rebuild committed while lock was held"
        finally:
            ixs._LOCK_STALE_SECONDS = orig
    # lock released: the rebuild completes
    th.join(timeout=300)
    assert done["v"], "rebuild must proceed once the lock frees"


def test_lock_release_spares_new_holders_lock(tmp_path):
    """r12 ADVICE: a holder whose lock was broken must NOT unlink the
    NEW holder's lock on exit — release is conditional on the file
    still carrying the releaser's own token."""
    import os as _os

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    with ixs._index_lock(root, timeout=5.0):
        # simulate a stale-break + re-acquire by another process:
        # the original lock vanishes and a different holder's token
        # occupies the path
        _os.unlink(lock_path)
        with open(lock_path, "w") as f:
            f.write("pid=other token=deadbeef\n")
    # the first holder's exit must have left the usurper's lock alone
    assert _os.path.exists(lock_path)
    with open(lock_path) as f:
        assert f.read() == "pid=other token=deadbeef\n"
    _os.unlink(lock_path)


def test_lock_heartbeat_tracks_liveness_not_start_time(tmp_path):
    """r12 ADVICE: staleness must track LIVENESS — a slow-but-alive
    holder heartbeats the lock mtime, so even a lock 'older' than the
    stale horizon is not broken while its holder keeps beating."""
    import os as _os
    import time as _time

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    orig_hb = ixs._LOCK_HEARTBEAT_SECONDS
    ixs._LOCK_HEARTBEAT_SECONDS = 0.05
    try:
        with ixs._index_lock(root, timeout=5.0):
            # backdate the mtime past the stale horizon; the heartbeat
            # must refresh it within a beat or two
            _os.utime(lock_path, (1, 1))
            deadline = _time.monotonic() + 5.0
            while _time.monotonic() < deadline:
                if _time.time() - _os.path.getmtime(lock_path) < 10.0:
                    break
                _time.sleep(0.02)
            assert _time.time() - _os.path.getmtime(lock_path) < 10.0, (
                "heartbeat did not refresh the lock mtime"
            )
            # a competitor now sees a FRESH lock and times out instead
            # of breaking the slow-but-alive holder
            with pytest.raises(TimeoutError, match="maintenance lock"):
                with ixs._index_lock(root, timeout=0.3):
                    pass
    finally:
        ixs._LOCK_HEARTBEAT_SECONDS = orig_hb
    assert not _os.path.exists(lock_path)


def test_stale_lock_break_has_single_winner(tmp_path):
    """r12 ADVICE: two breakers racing one stale lock used a
    stat-then-unlink sequence that could double-fire into a FRESH lock.
    The rename-claim makes breaking atomic: N threads racing a stale
    lock all eventually acquire, strictly one at a time, and no
    break-claim debris is left behind."""
    import os as _os
    import threading as _th

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    _os.makedirs(root, exist_ok=True)
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    with open(lock_path, "w") as f:
        f.write("pid=dead token=stale\n")
    _os.utime(lock_path, (1, 1))  # ancient: every thread sees it stale

    holders = []
    lock_err = []
    gate = _th.Lock()

    def worker():
        try:
            with ixs._index_lock(root, timeout=30.0):
                with gate:
                    holders.append(_th.get_ident())
                    if len(holders) > 1:
                        lock_err.append("overlap")
        except Exception as e:  # noqa: BLE001 — record, don't hang join
            lock_err.append(repr(e))
        finally:
            with gate:
                if holders and holders[-1] == _th.get_ident():
                    holders.pop()

    threads = [_th.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not lock_err, lock_err
    assert not _os.path.exists(lock_path)
    assert [f for f in _os.listdir(root) if ".break-" in f] == []


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_lock_exclusion_survives_slow_holders_under_tiny_stale_horizon(tmp_path):
    """r13 stress for the rewritten lock: holders that hold LONGER than
    the stale horizon (slow-but-alive, the r12 ADVICE regime) must keep
    mutual exclusion purely via the heartbeat — no waiter may break in,
    and no lock/claim debris may remain. Run at a harsh-but-fair
    regime: 1.5s horizon / 0.05s beat / 1.6-2.2s holds — a 30x
    beat-to-horizon ratio keeps the harshness class while leaving a
    stalled-thread margin a loaded CI machine will not blow through
    (r13 ADVICE: the earlier 0.15s-beat/0.6s-horizon margin could flake
    under a >0.45s Python scheduler stall)."""
    import os as _os
    import random as _random
    import threading as _th
    import time as _time

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    orig = ixs._LOCK_STALE_SECONDS, ixs._LOCK_HEARTBEAT_SECONDS
    ixs._LOCK_STALE_SECONDS = 1.5
    ixs._LOCK_HEARTBEAT_SECONDS = 0.05
    inside, errors = [], []
    gate = _th.Lock()

    def worker(tid):
        rng = _random.Random(tid)
        try:
            for _ in range(3):
                with ixs._index_lock(root, timeout=60.0):
                    with gate:
                        inside.append(tid)
                        if len(inside) > 1:
                            errors.append(f"exclusion lost: {inside}")
                    _time.sleep(rng.uniform(1.6, 2.2))  # > stale horizon
                    with gate:
                        inside.remove(tid)
        except Exception as e:  # noqa: BLE001 — record, don't hang join
            errors.append(f"t{tid}: {e!r}")

    try:
        threads = [_th.Thread(target=worker, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not any(t.is_alive() for t in threads), "lock wedged"
        assert not errors, errors[:3]
        assert _os.listdir(root) == []  # no lock or break-claim debris
    finally:
        ixs._LOCK_STALE_SECONDS, ixs._LOCK_HEARTBEAT_SECONDS = orig


def test_break_aborts_when_lock_replaced_during_confirm(tmp_path):
    """r13 ADVICE (medium): a breaker that stat'd a stale lock could
    rename a FRESH lock re-created in between, and the failed restore
    then unlinked the live holder's file. The sustained-observation
    window must catch the swap: a lock whose token changes between the
    first read and the re-check is never renamed."""
    import os as _os
    import threading as _th
    import time as _time

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    _os.makedirs(root, exist_ok=True)
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    with open(lock_path, "w") as f:
        f.write("pid=dead token=stale\n")
    _os.utime(lock_path, (1, 1))  # ancient — every waiter sees it stale

    orig = ixs._LOCK_STALE_SECONDS, ixs._LOCK_HEARTBEAT_SECONDS
    ixs._LOCK_STALE_SECONDS = 1.0
    ixs._LOCK_HEARTBEAT_SECONDS = 0.4  # confirm window = 0.25s
    fresh = "pid=live token=fresh\n"

    def swap():
        # lands inside the breaker's confirm sleep: the stale holder
        # "releases" and a new holder immediately re-acquires
        _time.sleep(0.08)
        _os.unlink(lock_path)
        with open(lock_path, "w") as f:
            f.write(fresh)

    th = _th.Thread(target=swap)
    th.start()
    try:
        with pytest.raises(TimeoutError, match="maintenance lock"):
            with ixs._index_lock(root, timeout=0.8):
                pass
    finally:
        th.join()
        ixs._LOCK_STALE_SECONDS, ixs._LOCK_HEARTBEAT_SECONDS = orig
    # the fresh lock survived, on its name, content untouched
    with open(lock_path) as f:
        assert f.read() == fresh
    assert [f for f in _os.listdir(root) if ".break-" in f] == []
    _os.unlink(lock_path)


def test_restore_lock_waits_out_vacancy_acquirer(tmp_path):
    """r13 ADVICE (medium), restore half: a live lock parked under a
    break-claim must be linked back even when a third waiter grabbed
    the vacant name — the restore retries on EEXIST until the
    vacancy-acquirer releases, and NEVER unlinks what it cannot
    restore."""
    import os as _os
    import threading as _th
    import time as _time

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    _os.makedirs(root, exist_ok=True)
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    claim = lock_path + ".break-deadbeef"
    live = "pid=live token=parked\n"
    with open(claim, "w") as f:
        f.write(live)
    # a third waiter owns the canonical name right now
    with open(lock_path, "w") as f:
        f.write("pid=third token=vacancy\n")

    # patience exhausted while the name stays occupied: the claim must
    # survive (never unlinked), the occupant must be untouched
    assert ixs._restore_lock(claim, lock_path, patience=0.3) is False
    assert _os.path.exists(claim)
    with open(lock_path) as f:
        assert f.read() == "pid=third token=vacancy\n"

    def release_third():
        _time.sleep(0.2)
        _os.unlink(lock_path)

    th = _th.Thread(target=release_third)
    th.start()
    try:
        assert ixs._restore_lock(claim, lock_path, patience=5.0) is True
    finally:
        th.join()
    assert not _os.path.exists(claim)
    with open(lock_path) as f:
        assert f.read() == live
    _os.unlink(lock_path)


def test_release_sweeps_own_parked_claim_only(tmp_path):
    """Release when the holder's lock was broken AND parked: the sweep
    unlinks only files carrying the releaser's own token — a
    competitor's lock on the canonical name and a foreign claim both
    survive."""
    import os as _os

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    _os.makedirs(root, exist_ok=True)
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    mine = "pid=me token=abc123\n"
    with open(lock_path + ".break-11111111", "w") as f:
        f.write(mine)  # my stolen, unrestorable lock
    with open(lock_path + ".break-22222222", "w") as f:
        f.write("pid=other token=zzz\n")  # someone else's claim
    with open(lock_path, "w") as f:
        f.write("pid=new token=holder\n")  # the current holder

    ixs._release_lock(lock_path, mine)
    names = sorted(_os.listdir(root))
    assert names == [ixs._LOCK_FILE, ixs._LOCK_FILE + ".break-22222222"]
    with open(lock_path) as f:
        assert f.read() == "pid=new token=holder\n"


def test_release_rename_inspect_discards_only_own_token(tmp_path):
    """r13 ADVICE (low): release must be rename-inspect — the removal
    decision is taken on the renamed file itself, so a replacement that
    lands in the check window is restored, not unlinked."""
    import os as _os

    import implementing_scds_in_hive_spark.operators.index_store as ixs

    root = str(tmp_path / "idx")
    _os.makedirs(root, exist_ok=True)
    lock_path = _os.path.join(root, ixs._LOCK_FILE)
    mine = "pid=me token=rel1\n"
    with open(lock_path, "w") as f:
        f.write(mine)
    ixs._release_lock(lock_path, mine)
    assert _os.listdir(root) == []  # own lock released, no .rel debris
