"""Regenerate the physical-plan evidence behind PLANS.md.

For each driver-registry query (or a named subset) prints: unique
shuffle-exchange count (BroadcastExchange excluded, signatures deduped
the way tests/test_plan_shapes.py does), join strategies used, whether
a single-partition exchange appears, and the pushed filters / read
schemas of the parquet scans.

Usage:
    python scripts/plan_report.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.plans.registry import queries  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402


def shuffle_sigs(plan: str) -> set[str]:
    return {
        re.sub(r"#\d+L?|plan_id=\d+", "", ln.strip())
        for ln in plan.splitlines()
        if re.search(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", ln)
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    spark = get_spark("plan-report", cpus=8)
    qs = queries()
    for name in names or qs:
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: ERROR {e}")
            continue
        joins = sorted(
            {m.group(0) for m in re.finditer(r"\b\w*(?:HashJoin|MergeJoin|NestedLoopJoin)\b", plan)}
        )
        pushed = sorted(
            {
                m.group(1)[:70]
                for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan)
                if m.group(1).strip()
            }
        )
        flags = []
        if "Exchange SinglePartition" in plan:
            flags.append("SINGLE-PARTITION!")
        # bounded-by-design cross products: the brute-force baseline
        # (broadcast queries × corpus) and the IVF probe's |Q| × K
        # centroid-assignment scoring — both documented in PLANS.md
        bnlj_ok = ("similarity_topk_bruteforce", "similarity_topk_ivf")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            flags.append("NESTED-LOOP!")
        print(
            f"{name}: shuffles={len(shuffle_sigs(plan))} "
            f"joins={','.join(joins) or '-'} "
            f"pushed={len(pushed)} {' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
