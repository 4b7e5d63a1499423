"""The rest of the SCD family: Type 3 and Type 6.

The reference implements Types 1+2 (overwrite + row versioning,
/root/reference/SCD_script.txt). The remaining members used in practice:

* **Type 3** — one row per key; each tracked column keeps its previous
  value in a sibling ``prev_<col>`` column (depth-1 history, cheap
  point-in-time-minus-one). Changes overwrite in place and shift the
  old value into ``prev_<col>``; per-column independence (a batch
  touching only ``addr`` must not disturb ``prev_phone``).
* **Type 6** (1+2+3 hybrid) — Type-2 row versioning PLUS ``cur_<col>``
  columns on EVERY row of a key mirroring the key's current (active)
  values, so historical rows can be filtered/grouped by current
  attributes without a self-join at query time.

Scale shapes: ``scd3_merge`` is the flagship's broadcast asymmetry —
production streams through one broadcast LEFT join (never shuffles) and
brand-new keys come from the key-pruned anti-join. ``add_current_columns``
(the Type-6 post-pass) is one unordered window over the key — a single
hash exchange; at 100 TB run it on the merge output you are already
rewriting, not as a separate job.
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import SCDConfig


def scd3_merge(
    prod: DataFrame,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    prev_prefix: str = "prev_",
    modified_col: str = "last_modified",
) -> DataFrame:
    """Type-3 merge: ``cfg.type2_cols`` are the *tracked* columns (one
    ``prev_<col>`` shadow each); ``cfg.type1_cols`` overwrite with no
    shadow. Production needs key + business + shadow + ``modified_col``
    columns; one row per key on both sides."""
    shadow = {c: f"{prev_prefix}{c}" for c in cfg.type2_cols}
    need = [cfg.key, *cfg.type1_cols, *cfg.type2_cols, *shadow.values(), modified_col]
    missing = [c for c in need if c not in prod.columns]
    if missing:
        raise ValueError(f"production table lacks columns {missing}")
    out_cols = list(prod.columns)
    dtypes = {f.name: f.dataType for f in prod.schema.fields}
    as_of_lit = F.lit(as_of).cast("timestamp")

    p, s = prod.alias("p"), staging.alias("s")
    pc = lambda c: F.col(f"p.{c}")  # noqa: E731
    sc = lambda c: F.col(f"s.{c}")  # noqa: E731
    staging_cols = set(staging.columns)

    chg = {c: ~pc(c).eqNullSafe(sc(c)) for c in cfg.type2_cols}
    any_chg = reduce(Column.__or__, chg.values())

    vals: dict[str, Column] = {c: pc(c) for c in out_cols}
    for c in cfg.type1_cols:
        if c in staging_cols:
            vals[c] = sc(c)
    for c, prev in shadow.items():
        # per-column independence: only a changed column shifts its shadow
        vals[c] = F.when(chg[c], sc(c)).otherwise(pc(c))
        vals[prev] = F.when(chg[c], pc(c)).otherwise(pc(prev))
    vals[modified_col] = F.when(any_chg, as_of_lit).otherwise(pc(modified_col))

    updated = (
        p.join(F.broadcast(s), pc(cfg.key) == sc(cfg.key), "left")
        .select(
            *[
                F.when(sc(cfg.key).isNull(), pc(c))
                .otherwise(vals[c])
                .cast(dtypes[c])
                .alias(c)
                for c in out_cols
            ]
        )
    )

    new_vals: dict[str, Column] = {
        c: (F.col(c) if c in staging_cols else F.lit(None)) for c in out_cols
    }
    for prev in shadow.values():
        new_vals[prev] = F.lit(None)
    new_vals[modified_col] = as_of_lit
    fresh = (
        staging.join(prod.select(cfg.key), cfg.key, "left_anti")
        .select(*[new_vals[c].cast(dtypes[c]).alias(c) for c in out_cols])
    )
    return updated.unionByName(fresh)


def add_current_columns(
    dim: DataFrame, cfg: SCDConfig, *, cur_prefix: str = "cur_"
) -> DataFrame:
    """Type-6 post-pass over an SCD2 dimension: append ``cur_<col>``
    for every Type-2 column, carrying the key's ACTIVE value onto all
    of its rows (NULL for a key with no active row, e.g. CDC-deleted).
    One unordered window per key — a single hash exchange."""
    w = Window.partitionBy(cfg.key)
    out = dim
    for c in cfg.type2_cols:
        out = out.withColumn(
            f"{cur_prefix}{c}",
            F.max(F.when(F.col(cfg.active_col), F.struct(F.col(c)))).over(w)[c],
        )
    return out
