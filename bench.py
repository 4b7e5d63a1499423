"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
collect), mirroring how a production job would write results out.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from implementing_scds_in_hive_spark.plans.registry import queries  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402


def _all_queries():
    """Registry queries plus the pytest-only set: the headline list is
    frozen for round-over-round comparability, so a query rotated out of
    the 50 driver slots (e.g. event_hourly_rollup in r5) must stay
    benchable."""
    import importlib

    qs = dict(queries())
    for m in ("scd_queries", "relational", "pipeline_ops"):
        mod = importlib.import_module(f"implementing_scds_in_hive_spark.plans.{m}")
        for k, v in getattr(mod, "PYTEST_ONLY_QUERIES", {}).items():
            qs.setdefault(k, v)
    return qs

# Representative of every subsystem; excludes the deliberately quadratic
# exhaustive jaccard oracle (its scale path, minhash_lsh, is included).
HEADLINE = [
    "scd2_merge_customer",
    "agg_lineitem_pricing",
    "join_star_schema",
    "window_topn_per_group",
    "top_orders",
    "having_agg_filter",
    "event_hourly_rollup",
    "sessionize",
    "asof_latest_order",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "text_stats",
    "corpus_select",
    "dedup_minhash_lsh",
    "multimodal_features",
]


# sf-sized scratch tables the extra-entry builders publish (IVF index,
# snapshot tables); removed after the run so repeated benches don't
# accumulate temp data (ADVICE r7 #4).
_SCRATCH_ROOTS: list[str] = []


def _scratch_root(tag: str) -> str:
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"bench_{tag}_{os.getpid()}")
    _SCRATCH_ROOTS.append(root)
    return root


def _cleanup_scratch() -> None:
    import shutil

    for root in _SCRATCH_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


def _calibration_df(spark, sf_dir):
    """Fixed calibration workload (VERDICT r13 next-round #3): a frozen
    scan + shuffle + aggregate over lineitem, expressed directly on the
    parquet with built-in functions only — it touches NO package code,
    so its wall time moves only with the container (CPU contention,
    I/O, JVM warmth), never with engine changes. Reporting each
    headline median as a RATIO to this query's median divides the
    measured >40% round-to-round container variance out of cross-round
    comparisons; the raw seconds stay the primary record."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        df.groupBy((F.col("l_orderkey") % 97).alias("bucket"))
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    qs = _all_queries()
    # measured run-to-run noise on this container is ±11% (PLANS.md r4
    # variance audit) — a single run can mask or fake a 10% win, so each
    # query reports the MEDIAN of n_runs with its min/max spread.
    # Default raised 3 -> 5 in r9 (VERDICT r8 'what's wrong' + ask #7):
    # two rounds of driver-vs-builder bench adjudication were pure
    # container-noise arbitration that medians-of-5 would have settled
    # at the source, for ~4 extra minutes per round.
    # SPARK_GRAFT_BENCH_RUNS=1 restores the quick single-run mode.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    # warm up the JVM/codegen paths (scan, broadcast-join, window, agg,
    # range-shuffle/two-pass-re-key shapes) so the first timed query
    # isn't charged for session bring-up and one-time operator-class
    # JIT. The flagship warms at sf0.001 — a different source path, so
    # its logical plan (and thus its persisted intermediates) shares
    # nothing with the timed sf0.1 run; only codegen warmth carries.
    for warm in ("top_orders", "join_star_schema", "window_topn_per_group"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # The heaviest-compile shapes warm at sf0.001 — a different source
    # path, so nothing but codegen/JIT warmth carries into the timed
    # sf0.1 run: the flagship's two-pass re-key, the minhash tower of
    # higher-order lambdas (measured: ~3s compile vs ~1.3s steady-state
    # compute at sf0.1), corpus scoring, and the Arrow/Python worker
    # startup behind mapInPandas.
    for warm in ("scd2_merge_customer", "dedup_minhash_lsh", "corpus_select",
                 "multimodal_features"):
        qs[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # calibration query: timed exactly like a headline (cold cache,
    # noop write, median of n_runs) AFTER warm-up so it measures the
    # container, not session bring-up
    calib_runs: list[float] = []
    for _ in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.time()
        _calibration_df(spark, sf_dir).write.format("noop").mode("overwrite").save()
        calib_runs.append(round(time.time() - t0, 3))
    calib_runs.sort()
    calib = calib_runs[len(calib_runs) // 2] if n_runs % 2 else round(
        (calib_runs[n_runs // 2 - 1] + calib_runs[n_runs // 2]) / 2, 3
    )
    print(
        f"# calibration: median {calib:.3f}s "
        f"(min {calib_runs[0]:.2f} max {calib_runs[-1]:.2f})",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        runs: list[float] = []
        for _ in range(n_runs):
            # each run starts cold-cache: operators that persist
            # intermediates (two-pass re-key, minhash shingles) would
            # otherwise be timed against a previous invocation's cache
            # (the CacheManager matches canonicalized plans), and
            # accumulated block-manager memory from earlier queries
            # would pressure later ones.
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        median = runs[len(runs) // 2] if n_runs % 2 else round(
            (runs[n_runs // 2 - 1] + runs[n_runs // 2]) / 2, 3
        )
        timings[name] = median
        spread[name] = [runs[0], runs[-1]]
        total += median
        print(f"# {name}: median {median:.2f}s (min {runs[0]:.2f} max {runs[-1]:.2f})",
              file=sys.stderr)

    # Amortized paths reported under "extra" so the headline total stays
    # frozen for round-over-round comparability: the stored-IVF probes
    # (VERDICT r5 #3), the snapshot pruned read (r6 #6), and the matview
    # refresh-vs-rebuild pair (r7 #7). Each GROUP builds its fixture and
    # is timed IMMEDIATELY, before the next group's build runs — r7's
    # probe-timing drift (+26%/+38%, disjoint spreads) coincided with
    # the snapshot-read BUILD landing between the IVF build and the
    # probe timings (the warmup-order sensitivity PLANS.md documents);
    # group isolation removes that interference structurally.
    extra: dict[str, float] = {}
    extra_spread: dict[str, list[float]] = {}

    def _time_extra_group(fns: dict) -> None:
        for pname, probe_fn in fns.items():
            runs = []
            for _ in range(n_runs):
                spark.catalog.clearCache()
                t0 = time.time()
                probe_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            runs.sort()
            median = runs[len(runs) // 2] if n_runs % 2 else round(
                (runs[n_runs // 2 - 1] + runs[n_runs // 2]) / 2, 3
            )
            extra[pname] = median
            extra_spread[pname] = [runs[0], runs[-1]]
            print(
                f"# {pname}: median {median:.2f}s "
                f"(min {runs[0]:.2f} max {runs[-1]:.2f}) [extra; one-time "
                "setup (index/table/view build) excluded]",
                file=sys.stderr,
            )

    for builder in (_build_stored_ivf, _build_snapshot_read,
                    _build_matview_refresh, _build_snapshot_vectored,
                    _build_skew_merge, _build_vector_ops):
        try:  # pragma: no cover - bench must always emit JSON
            _time_extra_group(builder(spark, sf_dir, n_runs))
        except Exception as e:
            print(f"# extra group {builder.__name__} failed: {e}",
                  file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "extra": extra,
                "extra_spread": extra_spread,
                "calibration_sec": calib,
                "queries_calibrated": {
                    name: round(t / calib, 2) for name, t in timings.items()
                } if calib > 0 else {},
                "total_calibrated": round(total / calib, 2) if calib > 0 else None,
                "runs": n_runs,
                "sf": sf,
            }
        )
    )
    _cleanup_scratch()


def _build_stored_ivf(spark, sf_dir, n_runs):
    """Build the oracle-pinned IVF index (same deterministic centroids as
    similarity_topk_ivf: vec_id % 40 == 7) into a scratch dir ONCE, and
    return {name: fn} probing the reloaded bucketed index — identical
    results to the headline query, amortized cost profile. Two variants:

    * ``similarity_topk_ivf_probe`` — plain equi-join against the stored
      assignment (ONE job). The right plan at this SF: 20 queries x
      nprobe 2 probe ~80% of the 50 inverted lists, so bucket pruning
      cannot pay for its extra probe-ranking job.
    * ``similarity_topk_ivf_probe_pruned`` — literal-IN bucket-pruned
      scan (``SelectedBucketsCount``), costing one extra tiny job. The
      100 TB path: there |C| >> |Q| x nprobe and the pruned scan skips
      almost every inverted list on DISK, which no in-join filter can.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.index_store import (
        load_ivf_index,
        save_ivf_index,
    )
    from implementing_scds_in_hive_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
    )
    from implementing_scds_in_hive_spark.plans.pipeline_ops import _query_vectors

    root = _scratch_root("ivf")
    shutil.rmtree(root, ignore_errors=True)
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    centroids = e.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(e, centroids)
    save_ivf_index(assigned, centroids, f"bench_ivf_{os.getpid()}", root)
    # Register the stored table ONCE — a repeated-query deployment keeps
    # the index registered; per-probe catalog work is not the workload.
    stored, cents = load_ivf_index(spark, root)

    def probe(spark, sf_dir):
        return ivf_topk(
            stored, _query_vectors(spark, sf_dir), cents, k=10, nprobe=2
        )

    def probe_pruned(spark, sf_dir):
        return ivf_topk(
            stored,
            _query_vectors(spark, sf_dir),
            cents,
            k=10,
            nprobe=2,
            probe_prune=True,
        )

    return {
        "similarity_topk_ivf_probe": probe,
        "similarity_topk_ivf_probe_pruned": probe_pruned,
    }


def _build_snapshot_read(spark, sf_dir, n_runs):
    """Bench the snapshot table's read path (VERDICT r6 next-round #6):
    commit the sf lineitem table as a range-clustered snapshot with
    per-file key stats ONCE (outside the timing), then time the same
    narrow-key-range aggregate two ways:

    * ``snapshot_read_full`` — manifest-resolved read of EVERY file,
      row filter applied at scan time (baseline: what a stats-less
      table pays).
    * ``snapshot_read_pruned`` — ``read_snapshot(prune=...)`` drops
      stats-disjoint files BEFORE the scan is planned; the skipped
      files are never even opened. Same rows, fewer files — the
      commit-log-as-index win, which grows with file count at 100 TB.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    root = _scratch_root("snap")
    shutil.rmtree(root, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_snapshot(
        li.repartitionByRange(64, "l_orderkey").sortWithinPartitions("l_orderkey"),
        root,
        stats_cols=["l_orderkey"],
    )
    b = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo = b[0]
    hi = b[0] + max(1, (b[1] - b[0]) // 64)  # ~1 file's key width

    def agg(df):
        return df.where(F.col("l_orderkey").between(lo, hi)).groupBy(
            "l_returnflag"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("revenue"),
        )

    def read_full(spark, sf_dir):
        return agg(read_snapshot(spark, root))

    def read_pruned(spark, sf_dir):
        return agg(
            read_snapshot(spark, root, prune={"l_orderkey": (lo, hi)})
        )

    return {
        "snapshot_read_full": read_full,
        "snapshot_read_pruned": read_pruned,
    }


def _build_snapshot_vectored(spark, sf_dir, n_runs):
    """Bench the merge-on-read READ overlay (r8 positional deletion
    vectors): commit the sf lineitem snapshot, apply one key-SCATTERED
    ~1% MoR DELETE in setup (untimed — every file ends up vectored,
    the worst case for the overlay), then time the same narrow-range
    aggregate as ``snapshot_read_full``:

    * ``snapshot_read_vectored`` — manifest-resolved read where every
      file pays the positional anti-join against its broadcast
      tombstones. Compare to ``snapshot_read_full`` (its own group, so
      warmup order stays isolated): the delta IS the overlay bill a
      reader carries until ``compact_deletes``/``maintain_table`` folds
      it.
    """
    import shutil

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.dml import delete_where
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    root = _scratch_root("snapv")
    shutil.rmtree(root, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_snapshot(
        li.repartitionByRange(64, "l_orderkey").sortWithinPartitions(
            "l_orderkey"
        ),
        root,
        stats_cols=["l_orderkey"],
    )
    rep = delete_where(spark, root, "l_orderkey % 97 = 13", tier="mor")
    assert rep["tier"] == "mor" and rep["rows_matched"] > 0
    b = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo = b[0]
    hi = b[0] + max(1, (b[1] - b[0]) // 64)

    def read_vectored(spark, sf_dir):
        return (
            read_snapshot(spark, root)
            .where(F.col("l_orderkey").between(lo, hi))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_extendedprice").alias("revenue"),
            )
        )

    return {"snapshot_read_vectored": read_vectored}


def _build_matview_refresh(spark, sf_dir, n_runs):
    """Bench the materialized-view maintenance loop (VERDICT r7 #7):

    * ``matview_refresh_delta`` — ONE ``maintain_view`` step folding a
      single pre-committed APPEND version (~0.5% new events; the source
      commits are staged in setup, untimed, and ``to_version`` pins each
      timed run to exactly one version) — the O(changed files + changed
      keys) incremental cost, including the view's own commit. Append
      commits share every parent file, so the version diff reads ONLY
      the appended files (the realistic event-table shape; an overwrite
      delta would force a full two-snapshot diff and time O(table)).
    * ``event_rollup_rebuild`` — the comparator a view without a change
      feed pays: a full rollup recompute over the same source. At sf0.1
      the source is small enough that per-job overhead narrows the gap;
      scripts/matview_scale_smoke.py measures the crossover at 20M rows.
    """
    import itertools
    import shutil

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.incremental import (
        event_rollup,
    )
    from implementing_scds_in_hive_spark.operators.matview import (
        maintain_view,
    )
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_table,
        write_snapshot,
    )

    src = _scratch_root("mv_src")
    view = _scratch_root("mv_view")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "event_type", "value"
    )
    # n_runs arrives FROM main() (r13 ADVICE: this builder used to
    # re-read SPARK_GRAFT_BENCH_RUNS and relied on the two defaults
    # staying equal by convention — r12's divergence made timed runs
    # 4-5 refresh past the last staged version, an EMPTY-delta no-op
    # measured at 0.02s). One resolution site means the staging count
    # and the timed-run count cannot drift; the under-stage guard in
    # refresh() stays as defense-in-depth.
    write_snapshot(e, src)
    n_batch = max(1, e.count() // 200)  # ~0.5% new events per version
    for i in range(1, n_runs + 1):
        delta = e.limit(n_batch).select(
            (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
            "ts", "event_type", "value",
        )
        write_snapshot(delta.coalesce(1), src, mode="append")
    maintain_view(spark, src, view, ["event_id"], to_version=1)  # untimed init
    last_staged = 1 + n_runs
    step = itertools.count(2)

    def refresh(spark, sf_dir):
        v = next(step)
        if v > last_staged:
            raise RuntimeError(
                f"matview bench under-staged: timed run wants version {v} "
                f"but only {last_staged} exist — an empty-delta refresh "
                f"would be measured as a ~0s no-op"
            )
        maintain_view(
            spark, src, view, ["event_id"],
            to_version=v,
            retain_versions=2, retain_grace_seconds=0.0,
        )
        # maintain_view already executed + committed the refresh; return
        # a token DF so the harness's noop write costs ~nothing instead
        # of re-reading the whole view into the timing
        return spark.range(1)

    def rebuild(spark, sf_dir):
        return event_rollup(read_table(spark, src))

    return {
        "matview_refresh_delta": refresh,
        "event_rollup_rebuild": rebuild,
    }


def _build_skew_merge(spark, sf_dir, n_runs):
    """Hot-key merge stress (VERDICT r11 #5; depth grown to the
    measured crossover in r13 per VERDICT r12 #2): a staging batch
    where 8 hot entities are each redelivered 1M times — the
    pathological CDC-redelivery shape the max_by dedupe tier exists
    for — with the redeliveries SCATTERED across partitions (hash of
    the unique sequence id), the way a real feed delivers them; the
    r12 shape left each key's copies co-located in one input split,
    which hid the window path's single-reducer toll. Both staging-
    dedupe formulations run through the full scd2_merge:

    * ``scd2_skew_merge_window`` — the row_number window dedupe: every
      redelivery of a hot key shuffles to ONE task (8M rows on 8 of 32
      threads here; unbounded at 100 TB);
    * ``scd2_skew_merge_maxby`` — the skew-immune max_by dedupe
      (operators/scd.py): partial_max_by collapses duplicates map-side,
      so the exchange carries one row per (partition, key) regardless
      of redelivery depth (pinned by
      tests/test_plan_shapes.py::test_dedupe_max_by_partial_aggregates_before_shuffle).

    Crossover measurement (scripts/skew_crossover_smoke.py, PLANS.md
    r13): at this depth maxby beats window end-to-end with disjoint
    spreads (1.32 vs 1.45 s; dedupe-only 0.60 vs 0.86 s); at r12's
    800-deep shape the two tie because the merge dominates. The skewed
    batch is staged to parquet in setup (untimed); each probe times
    dedupe + merge end-to-end.
    """
    import shutil

    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.scd import (
        dedupe_staging,
        scd2_merge,
    )
    from implementing_scds_in_hive_spark.plans.scd_fixtures import (
        AS_OF,
        CUSTOMER_CFG,
        customer_production,
        customer_staging,
    )

    stg_root = _scratch_root("skew_staging")
    shutil.rmtree(stg_root, ignore_errors=True)
    base = customer_staging(spark, sf_dir)
    # normal tail: every key redelivered 8x; hot head: the 8 lowest
    # keys redelivered 1M times each (~8M rows, ~98% of the batch)
    hot_keys = [r["c_custkey"] for r in
                base.select("c_custkey").orderBy("c_custkey")
                .limit(8).collect()]
    normal = base.withColumn("__copies", F.lit(8))
    hot = base.where(F.col("c_custkey").isin(hot_keys)).withColumn(
        "__copies", F.lit(1_000_000 - 8)
    )
    skewed = (
        normal.unionByName(hot)
        .withColumn(
            "__seq", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__copies")
        .withColumn(
            "__seq",
            F.col("__seq").cast("long") * 100_000_000
            + F.col("c_custkey"),
        )
    )
    skewed.repartition(64, "__seq").write.mode("overwrite").parquet(stg_root)

    def _merge(strategy):
        def probe(spark, sf_dir):
            stg = spark.read.parquet(stg_root)
            staged = dedupe_staging(
                stg, CUSTOMER_CFG, order_by=["__seq"], strategy=strategy
            ).drop("__seq")
            return scd2_merge(
                customer_production(spark, sf_dir), staged,
                CUSTOMER_CFG, AS_OF, broadcast_staging=True,
                key_strategy="two_pass",
            )
        return probe

    return {
        "scd2_skew_merge_window": _merge("row_number"),
        "scd2_skew_merge_maxby": _merge("max_by"),
    }


def _build_vector_ops(spark, sf_dir, n_runs):
    """r15 additions (extra entries only — the headline list stays
    frozen): the two operator paths this round restructured, so their
    cost is on the record for future rounds.

    * ``knn_join_ivf_cells`` — the IVF KNN self-join on the r15 arrow
      path (map-only top-nprobe probe assignment + cogrouped per-cell
      GEMM; was a centroid crossjoin of interpreted folds + a window
      shuffling nprobe embedding copies). Same deterministic centroids
      as the similarity slots (vec_id % 40 == 7).
    * ``kmeans_refine_exact`` — two exact-mean Lloyd iterations on the
      r15 fused assign+partial-mean pass (one map-only job per
      iteration; was assignment + a posexplode decimal aggregation).
      kmeans_refine collects between iterations, so the work happens
      inside the probe call; the returned local relation makes the
      harness's noop write a no-op on top.
    """
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.operators.similarity import (
        kmeans_refine,
        knn_join_ivf,
    )

    def knn(spark, sf_dir):
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        cents = e.where(F.col("vec_id") % 40 == 7).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        return knn_join_ivf(e, cents, k=5, nprobe=2)

    def kmeans(spark, sf_dir):
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        seed = e.where(F.col("vec_id") % 40 == 7).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        return kmeans_refine(e, seed, n_iter=2, exact_mean=True)

    return {"knn_join_ivf_cells": knn, "kmeans_refine_exact": kmeans}


if __name__ == "__main__":
    import atexit

    atexit.register(_cleanup_scratch)  # cover exception exits too
    main()
