"""Aggregates every driver-facing query and its DuckDB oracle.

Each plans/ module exposes ``QUERIES: dict[name, fn(spark, sf_dir)]`` and
``ORACLES: dict[name, sql]``; this registry merges them for
``__spark_entry__``. A query without an oracle entry gets the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "implementing_scds_in_hive_spark.plans.scd_queries",
    "implementing_scds_in_hive_spark.plans.relational",
    "implementing_scds_in_hive_spark.plans.pipeline_ops",
)


def _load() -> tuple[dict, dict]:
    import importlib

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in q:
                raise ValueError(f"duplicate query name {name!r}")
            q[name] = fn
        o.update(getattr(mod, "ORACLES", {}))
    return q, o


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def oracles() -> dict[str, str]:
    q, o = _load()
    return {k: v for k, v in o.items() if k in q}
