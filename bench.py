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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    qs = _all_queries()
    # measured run-to-run noise on this container is ±11% (PLANS.md r4
    # variance audit) — a single run can mask or fake a 10% win, so each
    # query reports the MEDIAN of n_runs with its min/max spread.
    # SPARK_GRAFT_BENCH_RUNS=1 restores the quick single-run mode.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

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

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs": n_runs,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
