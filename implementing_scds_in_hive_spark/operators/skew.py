"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins after a shuffle materializes. Salting is the explicit,
plan-level tool for the pathological cases AQE can't fix — e.g. one key
holding 30% of a 100 TB fact table, or skewed aggregation state.

* ``salted_join``: the skewed (large) side gets a uniform random salt in
  [0, n); the small side is exploded n ways so every (key, salt) pair
  exists. The join key becomes (key, salt) — the hot key's rows spread
  over n partitions instead of one. Cost: small side inflates n×
  (acceptable: it is the small side by assumption).
* ``salted_agg``: partial aggregation on (key, salt), final on key —
  identical to Spark's own map-side partial aggregation but with an
  explicit intermediate shuffle granularity, useful when a single
  group's partial state is itself too large (e.g. collect_list on a hot
  key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``large``. Result columns =
    large's columns + small's non-key columns (like a USING join).

    Only ``inner``/``left``(semi) are valid: the small side is exploded
    once per salt, so right/full/anti joins would emit one row per salt
    for small-side keys absent from large — wrong multiplicity."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r} "
            "(the exploded small side would change right/full/anti multiplicity)"
        )
    salted_l = large.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_s = small.select("*", salts)
    out = salted_l.join(salted_s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name -> (partial
    aggregate over the raw column, final aggregate over the partial
    column). Example: ``{"n": (F.count(F.lit(1)), F.sum("n"))}``."""
    salted = df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[f.alias(name) for name, (_, f) in aggs.items()]
    )
