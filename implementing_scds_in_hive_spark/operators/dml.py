"""Generic row-level DML on snapshot tables: DELETE WHERE, UPDATE SET
... WHERE, and RESTORE — the Delta/Iceberg maintenance verbs the SCD
merges don't cover.

The SCD paths (operators/scd.py) maintain a keyed dimension from a
staging batch; these operators instead take an arbitrary boolean
predicate over ANY snapshot table and remove/rewrite exactly the
matching rows, routed through the same two incremental publish tiers:

* **copy-on-write** — rewrite only the files that contain a matching
  row, carry the rest by reference (``mode="replace"`` commit, CAS'd on
  the parent version). Zero read overhead afterwards; write volume =
  the touched files.
* **merge-on-read** — tombstone the matching rows with FULL-ROW
  deletion vectors and (for UPDATE) append the rewritten rows as new
  files. Write volume = O(matched rows) however scattered they are;
  reads pay the vector overlay until ``sinks.compact_deletes`` folds
  it away.

Full-row tombstones are what make the generic verbs EXACT without a
key: a deterministic predicate is a pure function of the row's
columns, so any row column-identical to a matching row also matches —
deleting every copy of the tuple is precisely DELETE's semantics, with
no uniqueness precondition on the table. (Non-deterministic predicates
— ``rand()``, ``current_timestamp()`` — are evaluated independently by
the discovery scan and the rewrite and are NOT supported; results
would be undefined in any engine that scans twice.)

Three-valued logic follows ANSI DELETE/UPDATE: only rows where the
predicate is TRUE are affected; FALSE and NULL rows are kept
unchanged.

Reference anchor: the reference pipeline has no row-level DML at all —
its only write verb is the full INSERT OVERWRITE
(/root/reference/SCD_script.txt:141); these verbs are the storage-layer
capability a user of that pipeline graduates to on a table format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _resolve(root: str):
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
    )

    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    return v, load_manifest(root, v)


def _candidates(m: dict, prune: dict | None) -> list[str]:
    from implementing_scds_in_hive_spark.sources.snapshot import (
        _survives_prune,
    )

    if not prune:
        return list(m["files"])
    stats = m.get("stats", {})
    return [f for f in m["files"] if _survives_prune(stats.get(f, {}), prune)]


def _touched_files(
    spark: SparkSession, root: str, m: dict, candidates: list[str], pred
) -> tuple[list[str], int]:
    """One scan of the candidate files — column-pruned by Catalyst to
    the predicate's columns, parquet-filter-pushed within each file —
    yielding the files that contain >=1 TRUE row plus the total matched
    count. The collect is O(#touched files), never rows."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_manifest_files,
    )

    if not candidates:
        return [], 0
    cand = read_manifest_files(
        spark, root, m, candidates, rel_path_col="__rel"
    )
    per_file = (
        cand.where(pred)
        .groupBy("__rel")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    return sorted(r["__rel"] for r in per_file), sum(r["__n"] for r in per_file)


def _fold_prior_vectors(
    spark: SparkSession, root: str, m: dict, touched: list[str], tomb: DataFrame
) -> DataFrame:
    """A staged vector REPLACES the parent's for its file, so prior
    tombstones on re-vectored files must fold forward or their rows
    resurrect. Prior vectors with a DIFFERENT column set (e.g. an SCD
    merge's single-key vectors under a full-row DML vector) cannot be
    expressed in one batch — fold them into clean files first."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    prior_rels = sorted(
        {r for f in touched for r in m.get("deletes", {}).get(f, [])}
    )
    if not prior_rels:
        return tomb
    prior = spark.read.parquet(
        *[os.path.join(root, p) for p in prior_rels]
    ).where(F.col(DELETE_FILE_COL).isin(touched))
    if sorted(prior.columns) != sorted(tomb.columns):
        raise ValueError(
            f"touched files carry deletion vectors keyed by "
            f"{sorted(prior.columns)} which cannot fold into this "
            f"operation's {sorted(tomb.columns)} vectors — run "
            f"sinks.compact_deletes({root!r}) first"
        )
    return tomb.unionByName(prior.select(*tomb.columns))


def _stats_cols(m: dict) -> list[str] | None:
    return sorted({c for fs in m.get("stats", {}).values() for c in fs}) or None


def delete_where(
    spark: SparkSession,
    root: str,
    predicate,
    *,
    tier: str = "auto",
    prune: dict | None = None,
    cow_max_touched_fraction: float = 0.25,
) -> dict:
    """``DELETE FROM <root> WHERE <predicate>`` as an atomic replace
    commit. ``predicate`` is a SQL boolean string or a ``Column``;
    ``prune`` optionally pre-narrows the candidate files from the
    manifest's per-file stats (same form as ``read_snapshot(prune=)``)
    — without it the discovery scan still only reads the predicate's
    columns, filter-pushed, so untouched files cost a footer visit.

    ``tier="auto"`` routes on the touched-file fraction: few files →
    copy-on-write (rewrite them minus the matching rows), many →
    merge-on-read (full-row tombstones, no file rewritten). A table
    whose touched files carry incompatible (non-full-row) vectors
    auto-falls-back to CoW, which kills those files' vectors with the
    files. Returns ``{"op", "tier", "parent_version", "version",
    "files_total", "files_candidates", "files_touched",
    "rows_matched"}``; CAS-protected — a concurrent commit raises
    :class:`CommitConflictError` (re-run to retry on the new parent).
    """
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        read_manifest_files,
        write_snapshot,
    )

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    v, m = _resolve(root)
    candidates = _candidates(m, prune)
    touched, n_matched = _touched_files(spark, root, m, candidates, pred)
    out = {
        "op": "delete",
        "parent_version": v,
        "version": v,
        "files_total": len(m["files"]),
        "files_candidates": len(candidates),
        "files_touched": len(touched),
        "rows_matched": n_matched,
    }
    if not touched:
        return {**out, "tier": "noop"}
    import json as _json

    data_cols = [
        f["name"] for f in _json.loads(m["schema"])["fields"]
    ]
    tier = _route(root, m, touched, tier, cow_max_touched_fraction, data_cols)
    if tier == "cow":
        survivors = read_manifest_files(spark, root, m, touched).where(
            ~F.coalesce(pred.cast("boolean"), F.lit(False))
        )
        new_v = write_snapshot(
            survivors,
            root,
            partition_by=list(m["partition_by"]) or None,
            mode="replace",
            expected_version=v,
            stats_cols=_stats_cols(m),
            drop_files=touched,
        )
    else:
        rows = read_manifest_files(
            spark, root, m, touched, rel_path_col="__rel"
        )
        tomb = rows.where(pred).select(
            F.col("__rel").alias(DELETE_FILE_COL), *data_cols
        )
        tomb = _fold_prior_vectors(spark, root, m, touched, tomb)
        from pyspark.sql.types import StructType

        empty = spark.createDataFrame(
            [], StructType.fromJson(_json.loads(m["schema"]))
        )
        new_v = write_snapshot(
            empty,
            root,
            partition_by=list(m["partition_by"]) or None,
            mode="replace",
            expected_version=v,
            stats_cols=_stats_cols(m),
            drop_files=[],
            delete_vectors=tomb,
        )
    return {**out, "tier": tier, "version": new_v}


def update_where(
    spark: SparkSession,
    root: str,
    set_exprs: dict,
    predicate,
    *,
    tier: str = "auto",
    prune: dict | None = None,
    cow_max_touched_fraction: float = 0.25,
) -> dict:
    """``UPDATE <root> SET col = expr, ... WHERE <predicate>`` as an
    atomic replace commit. ``set_exprs`` maps column names to SQL
    expression strings or ``Column``s evaluated against the matching
    row (self-references fine: ``{"qty": "qty + 1"}``); each result is
    cast back to the column's declared type so the table schema is
    invariant. Same tiers, routing, pruning, 3VL and CAS semantics as
    :func:`delete_where`; the merge-on-read form tombstones the
    original matching rows (full-row vectors) and appends the rewritten
    rows as new files — O(matched rows) write volume however scattered
    the predicate."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        read_manifest_files,
        write_snapshot,
    )

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    v, m = _resolve(root)
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(m["schema"]))
    known = {f.name for f in schema.fields}
    bad = sorted(set(set_exprs) - known)
    if bad:
        raise ValueError(f"SET references unknown columns {bad}; table has {sorted(known)}")
    types = {f.name: f.dataType for f in schema.fields}
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e).cast(types[c])
        for c, e in set_exprs.items()
    }
    candidates = _candidates(m, prune)
    touched, n_matched = _touched_files(spark, root, m, candidates, pred)
    out = {
        "op": "update",
        "parent_version": v,
        "version": v,
        "files_total": len(m["files"]),
        "files_candidates": len(candidates),
        "files_touched": len(touched),
        "rows_matched": n_matched,
    }
    if not touched:
        return {**out, "tier": "noop"}
    data_cols = [f.name for f in schema.fields]
    tier = _route(root, m, touched, tier, cow_max_touched_fraction, data_cols)
    hit = F.coalesce(pred.cast("boolean"), F.lit(False))
    if tier == "cow":
        rows = read_manifest_files(spark, root, m, touched)
        rewritten = rows.select(
            *[
                (
                    F.when(hit, sets[c]).otherwise(F.col(c)).alias(c)
                    if c in sets
                    else F.col(c)
                )
                for c in rows.columns
            ]
        )
        new_v = write_snapshot(
            rewritten,
            root,
            partition_by=list(m["partition_by"]) or None,
            mode="replace",
            expected_version=v,
            stats_cols=_stats_cols(m),
            drop_files=touched,
        )
    else:
        rows = read_manifest_files(
            spark, root, m, touched, rel_path_col="__rel"
        )
        matched = rows.where(pred)
        tomb = matched.select(
            F.col("__rel").alias(DELETE_FILE_COL), *data_cols
        )
        tomb = _fold_prior_vectors(spark, root, m, touched, tomb)
        updated = matched.select(
            *[
                (sets[c].alias(c) if c in sets else F.col(c))
                for c in data_cols
            ]
        )
        new_v = write_snapshot(
            updated,
            root,
            partition_by=list(m["partition_by"]) or None,
            mode="replace",
            expected_version=v,
            stats_cols=_stats_cols(m),
            drop_files=[],
            delete_vectors=tomb,
        )
    return {**out, "tier": tier, "version": new_v}


def _route(
    root: str,
    m: dict,
    touched: list[str],
    tier: str,
    cow_max_touched_fraction: float,
    full_row_cols: list[str],
) -> str:
    """Tier policy shared by both verbs. ``auto`` routes on the
    touched-file fraction (the CoW write bill is the touched files; the
    MoR bill is O(matched rows) + a read overlay) — except that touched
    files carrying vectors a full-row batch cannot fold (a different
    column set, e.g. an SCD merge's single-key vectors) route to CoW,
    which retires those vectors with their files and is therefore
    always compatible. The probe is one parquet footer read driver-side
    (all of one commit's vector files share a schema)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
    )

    if tier not in ("auto", "cow", "mor"):
        raise ValueError(f"tier must be auto|cow|mor, got {tier!r}")
    if tier != "auto":
        return tier
    frac = len(touched) / max(1, len(m["files"]))
    chosen = "cow" if frac <= cow_max_touched_fraction else "mor"
    if chosen == "mor":
        deletes = m.get("deletes", {})
        vectored = [f for f in touched if f in deletes]
        if vectored:
            import pyarrow.parquet as pq

            have = set(
                pq.read_schema(
                    os.path.join(root, deletes[vectored[0]][0])
                ).names
            )
            if have != {DELETE_FILE_COL, *full_row_cols}:
                return "cow"
    return chosen


def restore_version(
    spark: SparkSession,
    root: str,
    version: int,
    *,
    expected_version: int | None = None,
) -> int:
    """``RESTORE TABLE <root> TO VERSION AS OF <version>`` — commit a
    NEW version whose content equals the historical one (roll-forward
    restore, like Delta's: history is preserved, the restore is itself
    a commit that a second restore can undo). Implemented as a full
    re-publish of the pinned read — correct for any retained version;
    a carry-by-reference restore is a possible future protocol
    extension (the old files still exist while their manifest is
    retained, but the replace-commit validation intentionally only
    admits parent files). Returns the new version."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        load_manifest,
        read_snapshot,
        write_snapshot,
    )

    m = load_manifest(root, version)
    df = read_snapshot(spark, root, version=version)
    return write_snapshot(
        df,
        root,
        partition_by=list(m["partition_by"]) or None,
        mode="overwrite",
        expected_version=expected_version,
        stats_cols=_stats_cols(m),
        app_meta={"restored_from_version": version},
    )
