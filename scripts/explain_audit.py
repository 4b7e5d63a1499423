"""Dump the formatted physical plan of every driver query — the
reproducible source for PLANS.md's audit.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
Writes plans to stdout; grep for `Exchange` / `PushedFilters` /
`WholeStageCodegen` to audit shuffle counts, pushdown, and codegen
coverage per query.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from implementing_scds_in_hive_spark.plans.registry import queries  # noqa: E402
from implementing_scds_in_hive_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    for name, fn in sorted(queries().items()):
        if only and name not in only:
            continue
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # keep auditing the rest
            plan = f"ERROR: {e}\n"
        n_exchange = plan.count("Exchange")
        print(f"\n{'=' * 70}\n{name}  [Exchange nodes: {n_exchange}]\n{'=' * 70}")
        print(plan)


if __name__ == "__main__":
    main()
