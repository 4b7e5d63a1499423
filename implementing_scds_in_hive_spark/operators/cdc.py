"""CDC (change-data-capture) feed → SCD2 dimension maintenance.

The reference pipeline (/root/reference/SCD_script.txt:3-155) consumes
full staging *snapshots*: a key's absence means "no change" and nothing
is ever deleted. Real upstream sources (Debezium, DMS, binlog tailers)
instead emit an *operation feed* — (op, sequence, values) rows where op
is insert/update/delete — which the snapshot-shaped merge cannot apply:

* a key absent from the batch must be carried, but a key whose LAST
  operation is a delete must have its active version closed out;
* multiple operations on one key within a batch must collapse to the
  final state (micro-batch granularity, the same contract as the
  ``foreachBatch`` streaming upsert in ``streaming/scd_stream.py``);
* an insert AFTER a delete must resurrect the key with a fresh active
  version numbered ``max(historical version) + 1`` — the snapshot
  merge's "all-inactive keys never resurrect" edge case (faithful to
  the reference, operators/scd.py:40-43) is exactly wrong for CDC.

Scale shape (the production side is the 100 TB side):

* ``collapse_cdc`` is a ``max_by`` aggregation on the (small) feed —
  map-side partial combine, never a window over full rows.
* Production is scanned once for the branch pass — a broadcast LEFT
  join against the collapsed feed, so production NEVER shuffles.
* The per-key stats the resurrection/versioning logic needs
  (max version, any-active, active row's Type-2 values) are computed
  on production rows *semi-joined down to the feed's keys first*
  (broadcast semi-join, map-side), so the stats aggregation shuffles
  only ``|feed keys| × 3`` narrow columns, not the dimension.
* Surrogate re-key reuses ``assign_surrogate_keys`` (``two_pass`` /
  ``hash`` for scale; ``row_number`` for reference parity).
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import (
    SCDConfig,
    assign_surrogate_keys,
)


def collapse_cdc(
    changes: DataFrame,
    cfg: SCDConfig,
    *,
    op_col: str = "op",
    seq_col: str = "op_seq",
) -> DataFrame:
    """Collapse an operation feed to one final-state row per key.

    Last-wins under ``seq_col`` (commit LSN / binlog position / event
    time — must be unique per key for a deterministic result). The
    output keeps ``op_col`` (the FINAL operation) and drops ``seq_col``;
    intermediate operations are intentionally lost — history granularity
    is the batch, matching the streaming upsert's contract.

    Implemented as a ``max_by(struct(payload), seq)`` aggregation, not a
    ``row_number`` window: partial aggregation collapses duplicates
    map-side, so the shuffle carries one row per (partition × key)
    instead of every feed row sorted per key.
    """
    payload = [c for c in changes.columns if c not in (cfg.key, seq_col)]
    collapsed = changes.groupBy(cfg.key).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("__last")
    )
    return collapsed.select(cfg.key, *[F.col(f"__last.{c}").alias(c) for c in payload])


def snapshot_to_cdc(
    old: DataFrame,
    new: DataFrame,
    cfg: SCDConfig,
    *,
    op_col: str = "op",
    seq_col: str = "op_seq",
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Diff two full snapshots into an I/U/D operation feed — the bridge
    from snapshot-shaped sources to the CDC apply path (and the way to
    get DELETE semantics out of snapshot inputs at all: the snapshot
    merge treats absence as "no change"; diffing two snapshots makes
    absence explicit).

    * key in ``new`` only → I (insert, new values)
    * key in both with any ``compare_cols`` difference (null-safe) → U
    * key in ``old`` only → D (payload NULLs, like a real change feed)
    * identical rows produce NOTHING — the feed carries changes only,
      so applying it is O(changed keys), not O(snapshot)

    ``compare_cols`` defaults to every business column except the key.
    All three branches come from ONE full-outer join on the key (both
    sides shuffle once; broadcast doesn't apply to full-outer in Spark).
    ``seq_col`` is constant 1 — a snapshot diff has one state per key.
    """
    cmp_cols = tuple(
        compare_cols
        if compare_cols is not None
        else [c for c in cfg.business_cols if c != cfg.key]
    )
    if not cmp_cols:
        raise ValueError("compare_cols must be non-empty")
    o, n_ = old.alias("o"), new.alias("n")
    oc = lambda c: F.col(f"o.{c}")  # noqa: E731
    nc = lambda c: F.col(f"n.{c}")  # noqa: E731

    differs = reduce(Column.__or__, [~oc(c).eqNullSafe(nc(c)) for c in cmp_cols])
    op = (
        F.when(oc(cfg.key).isNull(), F.lit("I"))
        .when(nc(cfg.key).isNull(), F.lit("D"))
        .when(differs, F.lit("U"))
    )  # equal rows: NULL op, filtered below

    payload_cols = [c for c in new.columns if c != cfg.key]
    return (
        o.join(n_, oc(cfg.key) == nc(cfg.key), "full_outer")
        .withColumn("__op", op)
        .where(F.col("__op").isNotNull())
        .select(
            F.coalesce(nc(cfg.key), oc(cfg.key)).alias(cfg.key),
            *[
                F.when(F.col("__op") != "D", nc(c)).alias(c)
                for c in payload_cols
            ],
            F.col("__op").alias(op_col),
            F.lit(1).alias(seq_col),
        )
    )


def cdc_apply(
    prod: DataFrame,
    changes: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    op_col: str = "op",
    seq_col: str = "op_seq",
    delete_ops: tuple[str, ...] = ("D", "d", "delete"),
    key_strategy: str = "two_pass",
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Apply one collapsed CDC batch to an SCD2 dimension.

    Per-key semantics, by the key's FINAL operation in the batch:

    * **delete** — the active version (if any) is closed out
      (``end = as_of``, ``active = false``); history rows are carried
      verbatim; a delete for an unknown or already-inactive key is a
      no-op. No values are rewritten (a delete carries none).
    * **insert/update** (any non-delete op; snapshot-upsert semantics):
      - key absent from production → brand-new version-1 row;
      - key with an active row whose Type-2 values changed (null-safe)
        → close-out + new version ``max+1``; Type-1 columns rewritten
        on every surviving row of the key;
      - key with an active row, unchanged → Type-1 rewrites only;
      - key with NO active row (previously deleted) → **resurrection**:
        Type-1 rewrites on history + a fresh active version ``max+1``
        even if its values equal the last closed version (existence
        itself changed).

    Returns the next full dimension table, surrogate keys reassigned
    (same step-8 contract as ``scd2_merge``).

    The collapsed feed (and the ``two_pass`` re-key intermediates) are
    persisted internally; the lazily returned plan cannot release them
    itself. Callers applying many sequential feeds (the streaming
    wrapper does this per batch) should pass ``cache_handles=[]`` and
    unpersist each handle once the result is materialized (see
    examples/cdc_pipeline.py), or cached blocks accumulate for the
    session.
    """
    out_cols = prod.columns
    dtypes = {f.name: f.dataType for f in prod.schema.fields}
    missing = [c for c in (cfg.surrogate_col, *cfg.business_cols, *cfg.meta_cols) if c not in dtypes]
    if missing:
        raise ValueError(f"production table lacks columns {missing}")

    as_of_lit = F.lit(as_of).cast("timestamp")
    eot_lit = F.lit(cfg.end_of_time).cast("timestamp")

    # The collapsed feed is referenced three times (branch join, stats
    # semi-join, fresh-keys join); persist so the collapse aggregation
    # runs once — the feed is the small side by construction, so this
    # pins at most one batch of keys. (Same internal-persist precedent
    # as the two_pass re-key in operators/scd.py.)
    from pyspark.storagelevel import StorageLevel

    fin = collapse_cdc(changes, cfg, op_col=op_col, seq_col=seq_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if cache_handles is not None:
        cache_handles.append(fin)
    is_delete = F.col(op_col).isin(*delete_ops)
    upserts = fin.where(~is_delete).drop(op_col)

    staging_cols = set(upserts.columns)

    p = prod.alias("p")
    f_ = fin.alias("f")
    pc = lambda c: F.col(f"p.{c}")  # noqa: E731
    fc = lambda c: F.col(f"f.{c}")  # noqa: E731

    changed = reduce(
        Column.__or__, [~pc(c).eqNullSafe(fc(c)) for c in cfg.type2_cols]
    )

    def strct(vals: dict[str, Column]) -> Column:
        return F.struct(*[vals[c].cast(dtypes[c]).alias(c) for c in out_cols])

    p_vals = {c: pc(c) for c in out_cols}
    t1_vals = dict(p_vals)
    for c in cfg.type1_cols:
        if c in staging_cols:
            t1_vals[c] = fc(c)

    carried = strct(p_vals)
    type1_rw = strct(t1_vals)
    closeout_rw = strct({**t1_vals, cfg.end_col: as_of_lit, cfg.active_col: F.lit(False)})
    # Delete close-out carries the row's own values — no rewrite source.
    closeout_del = strct({**p_vals, cfg.end_col: as_of_lit, cfg.active_col: F.lit(False)})

    del_match = fc(op_col).isin(*delete_ops)
    prod_next = (
        p.join(F.broadcast(f_), pc(cfg.key) == fc(cfg.key), "left")
        .select(
            F.when(fc(cfg.key).isNull(), carried)  # key untouched this batch
            .when(del_match & pc(cfg.active_col), closeout_del)
            .when(del_match, carried)  # history under a delete: verbatim
            .when(pc(cfg.active_col) & changed, closeout_rw)
            .otherwise(type1_rw)  # inactive or unchanged: Type-1 rewrite
            .alias("r")
        )
        .select("r.*")
    )

    # Per-key stats for versioning/resurrection, computed ONLY over
    # production rows of upserted keys: broadcast semi-join prunes the
    # dimension map-side before the (tiny) aggregation shuffles.
    act = F.when(pc(cfg.active_col), F.lit(1))
    stats = (
        p.join(F.broadcast(upserts.select(cfg.key)), cfg.key, "left_semi")
        .groupBy(cfg.key)
        .agg(
            F.max(cfg.version_col).alias("__max_v"),
            F.max(F.col(cfg.active_col).cast("int")).alias("__has_active"),
            F.max_by(F.struct(*[F.col(c) for c in cfg.type2_cols]), act).alias("__act"),
        )
    )

    # Broadcast the RIGHT side: Spark cannot build-left a LeftOuter
    # join, so hinting the upserts would fall back to sort-merge. The
    # stats side is ≤ one row per feed key — always broadcast-sized.
    u = upserts.alias("u")
    st = F.broadcast(stats).alias("st")
    uc = lambda c: F.col(f"u.{c}")  # noqa: E731
    changed_vs_active = reduce(
        Column.__or__,
        [~F.col(f"st.__act.{c}").eqNullSafe(uc(c)) for c in cfg.type2_cols],
    )
    needs_new = (
        F.col("st.__max_v").isNull()  # brand-new key
        | (F.col("st.__has_active") == 0)  # resurrection after delete
        | changed_vs_active
    )

    def new_vals() -> dict[str, Column]:
        vals = {c: (uc(c) if c in staging_cols else F.lit(None)) for c in out_cols}
        vals[cfg.surrogate_col] = F.lit(None)
        vals[cfg.version_col] = F.coalesce(F.col("st.__max_v"), F.lit(0)) + 1
        vals[cfg.start_col] = as_of_lit
        vals[cfg.end_col] = eot_lit
        vals[cfg.active_col] = F.lit(True)
        return vals

    fresh = (
        u.join(st, uc(cfg.key) == F.col(f"st.{cfg.key}"), "left")
        .where(needs_new)
        .select(strct(new_vals()).alias("r"))
        .select("r.*")
    )

    return assign_surrogate_keys(
        prod_next.unionByName(fresh),
        cfg,
        strategy=key_strategy,
        cache_handles=cache_handles,
    )
