"""Retroactive (late-arriving) corrections to SCD2 history.

The reference merge (/root/reference/SCD_script.txt steps 5-6) can only
append a new version at the merge instant: every change is assumed to be
observed in order. A late-arriving fact — "as of ``eff_ts`` (in the
past), this key's Type-2 values were X" — must instead be *spliced into
the interval timeline*:

* the version whose ``[start, end)`` interval contains ``eff_ts`` is
  truncated to ``[start, eff_ts)`` (inactive — it no longer reaches the
  open end), and a new piece ``[eff_ts, original end)`` is inserted
  carrying the corrected Type-2 values; the piece inherits the
  containing version's activeness (splicing into the active interval
  yields the new active row) and its Type-1 values (Type-1 columns are
  current-value-overwrite by definition — a retro fact does not carry
  them);
* an ``eff_ts`` earlier than the key's first version prepends an
  inactive piece ``[eff_ts, first start)`` (Type-1 values from the
  earliest version);
* a correction equal (null-safe) to the containing version's values is
  a no-op; an ``eff_ts`` falling in a coverage gap (a key deleted over
  that period — possible after ``cdc_apply``) is dropped: the entity
  did not exist then, there is no interval to correct. A late row for a
  key ABSENT from the dimension entirely is likewise dropped (nothing
  to correct) — create keys through the merge/CDC path first, then
  replay corrections;
* ``eff_ts`` exactly at a version's start *replaces* that version's
  values over its whole interval (the truncated original is zero-width
  and is dropped);
* per-key version numbers are recomputed 1..n in start order over the
  spliced keys (same normalization contract as the reference's step-8
  wholesale surrogate reassignment).

Precondition: at most one late row per key per batch (apply batches in
sequence for multi-correction keys — same contract as
``dedupe_staging``).

Scale shape (production is the 100 TB side): late batches are small, so
untouched keys are separated by a broadcast anti-join and carried
verbatim — map-side, production never shuffles. Only the touched keys'
rows (|late keys| × versions-per-key) flow through the splice union and
the per-key renumbering window. Surrogate re-key via
``assign_surrogate_keys`` (``two_pass``/``hash`` for scale).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    assign_surrogate_keys,
)


def retro_splice(
    prod: DataFrame,
    late: DataFrame,
    cfg: SCDConfig,
    *,
    eff_col: str = "eff_ts",
    key_strategy: str = "two_pass",
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Splice one batch of late-arriving Type-2 corrections into an SCD2
    dimension. ``late`` carries ``cfg.key``, ``eff_col`` and the Type-2
    columns; returns the next full dimension (surrogate keys
    reassigned).

    Persists the touched-rows join (and the ``two_pass`` re-key
    intermediates) internally; batch callers applying many sequential
    splices should pass ``cache_handles=[]`` and unpersist each handle
    after materializing the result (same contract as ``cdc_apply``)."""
    out_cols = prod.columns
    dtypes = {f.name: f.dataType for f in prod.schema.fields}
    # the splice join assumes AT MOST ONE late row per key — a
    # duplicate-key batch would fan out every touched prod row per
    # late row and silently emit a dimension with duplicated,
    # overlapping intervals (r11 review). The check is one tiny agg
    # over the broadcast-sized batch; collapse duplicates upstream
    # (e.g. keep the latest correction per key) before splicing.
    dup = (
        late.groupBy(cfg.key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            f"retro_splice takes at most one late row per key per "
            f"batch; duplicate keys (first 5): "
            f"{[r[cfg.key] for r in dup]} — collapse the batch first"
        )
    l_keys = F.broadcast(late.select(cfg.key))

    untouched = prod.join(l_keys, cfg.key, "left_anti")
    touched = prod.join(l_keys, cfg.key, "left_semi")

    t = touched.alias("t")
    l = F.broadcast(late).alias("l")
    tc = lambda c: F.col(f"t.{c}")  # noqa: E731
    lc = lambda c: F.col(f"l.{c}")  # noqa: E731

    eff = lc(eff_col).cast("timestamp")
    cont = (tc(cfg.start_col) <= eff) & (eff < tc(cfg.end_col))
    differs = reduce(
        Column.__or__, [~tc(c).eqNullSafe(lc(c)) for c in cfg.type2_cols]
    )

    def strct(vals: dict[str, Column]) -> Column:
        return F.struct(*[vals[c].cast(dtypes[c]).alias(c) for c in out_cols])

    t_vals = {c: tc(c) for c in out_cols}
    truncated = strct({**t_vals, cfg.end_col: eff, cfg.active_col: F.lit(False)})
    piece_vals = dict(t_vals)
    for c in cfg.type2_cols:
        piece_vals[c] = lc(c)
    piece_vals[cfg.start_col] = eff
    piece = strct(piece_vals)  # end + active inherited from the host row

    # referenced by both the splice pass and the prepend aggregation;
    # persist so the touched-rows join computes once (touched keys are
    # the small side by construction)
    from pyspark.storagelevel import StorageLevel

    j = t.join(l, tc(cfg.key) == lc(cfg.key))
    if cache_handles is not None:
        j = j.persist(StorageLevel.MEMORY_AND_DISK)
        cache_handles.append(j)
    else:
        # default path must not LEAK the cached partitions (r11 review:
        # nothing ever unpersisted them) — checkpoint blocks are
        # released by the ContextCleaner once the DataFrame is GC'd,
        # same discipline as incremental_minhash_pairs
        j = j.localCheckpoint(eager=True)
    split = (
        j.select(
            F.when(cont & differs, F.array(truncated, piece))
            .otherwise(F.array(strct(t_vals)))
            .alias("r")
        )
        .select(F.explode("r").alias("r"))
        .select("r.*")
        # eff_ts exactly at a version start: the truncated original is
        # zero-width — drop it; the piece replaces the version outright.
        .where(F.col(cfg.start_col) < F.col(cfg.end_col))
    )

    # Prepend: late rows earlier than the key's whole history. Type-1
    # values come from the earliest version (min_by); keys where some
    # interval contains eff, or where eff lands in a coverage gap,
    # produce nothing here.
    g = j.groupBy(tc(cfg.key).alias(cfg.key)).agg(
        F.min(tc(cfg.start_col)).alias("__min_start"),
        F.max(cont.cast("int")).alias("__any_cont"),
        F.min_by(
            F.struct(*[tc(c) for c in out_cols]), tc(cfg.start_col)
        ).alias("__first"),
    )
    fc = lambda c: F.col(f"g.__first.{c}")  # noqa: E731
    pre_vals = {c: fc(c) for c in out_cols}
    for c in cfg.type2_cols:
        pre_vals[c] = lc(c)
    pre_vals[cfg.start_col] = eff
    pre_vals[cfg.end_col] = F.col("g.__min_start")
    pre_vals[cfg.active_col] = F.lit(False)
    prepend = (
        g.alias("g")
        .join(l, F.col(f"g.{cfg.key}") == lc(cfg.key))
        .where((F.col("g.__any_cont") == 0) & (eff < F.col("g.__min_start")))
        .select(strct(pre_vals).alias("r"))
        .select("r.*")
    )

    # Renumber versions 1..n by start order — touched keys only, so the
    # window shuffles |late keys| × versions, not the dimension.
    w = Window.partitionBy(cfg.key).orderBy(cfg.start_col)
    renumbered = (
        split.unionByName(prepend)
        .withColumn(
            cfg.version_col,
            F.row_number().over(w).cast(dtypes[cfg.version_col]),
        )
    )

    return assign_surrogate_keys(
        untouched.unionByName(renumbered),
        cfg,
        strategy=key_strategy,
        cache_handles=cache_handles,
    )
