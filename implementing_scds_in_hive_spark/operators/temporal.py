"""Temporal (as-of-each-row) join: facts enriched with the dimension
version valid at each fact's own timestamp.

``scd_point_in_time`` (plans/scd_queries.py) reconstructs the dimension
at ONE instant; the production read pattern is per-row: every fact joins
the version whose ``[scd_start_date, scd_end_date)`` interval contains
that fact's event time. This is what interval-versioned SCD2 buys —
time travel is an equi-join plus a containment filter, no table-format
feature needed.

Plan shape: equi-join on the business key with the containment
predicate in the SAME join condition (Catalyst plans key equality as
the join key and containment as a residual filter — a hash join, never
a nested-loop, because an equi-conjunct exists). Versions-per-key is
small by construction, so the residual discards a handful of rows per
match. The dimension broadcasts when it fits; otherwise both sides
shuffle on the key — the fact table never explodes because at most one
version interval contains any timestamp (intervals within a key are
disjoint by merge construction).

``how='left'`` keeps facts with no containing version (before the key
existed, or during a CDC-deleted gap) with NULL dimension columns —
the honest answer for "what was this entity then": it wasn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import SCDConfig


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    cfg: SCDConfig,
    *,
    fact_key: str,
    ts_col: str,
    dim_cols: list[str] | None = None,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Each fact row joined to the dimension version valid at its
    ``ts_col``. ``dim_cols`` selects which dimension columns to carry
    (default: business + version columns). Fact columns keep their
    names; dimension column names must not collide with them."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")
    carry = list(
        dim_cols
        if dim_cols is not None
        else [c for c in (*cfg.business_cols, cfg.version_col) if c != cfg.key]
    )
    # start/end are dropped by name at the end — a fact column with the
    # same name would be silently deleted, so reject it here too
    overlap = set(facts.columns) & {*carry, cfg.key, cfg.start_col, cfg.end_col}
    if overlap:
        raise ValueError(f"column names must be disjoint; both sides have {sorted(overlap)}")

    d = dim.select(cfg.key, cfg.start_col, cfg.end_col, *carry)
    if broadcast_dim:
        d = F.broadcast(d)
    ts = F.col(ts_col)
    cond = (
        (facts[fact_key] == d[cfg.key])
        & (d[cfg.start_col] <= ts)
        & (ts < d[cfg.end_col])
    )
    return facts.join(d, cond, how).drop(cfg.key, cfg.start_col, cfg.end_col)
