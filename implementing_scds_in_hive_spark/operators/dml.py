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
* **merge-on-read** — tombstone the matching rows with deletion
  vectors and (for UPDATE) append the rewritten rows as new files.
  Write volume = O(matched rows) however scattered they are; reads pay
  the vector overlay until ``sinks.compact_deletes`` folds it away.

Vectors default to POSITIONAL (``vector_format="pos"``: ``(__file,
__pos)`` from the scan's ``_metadata.row_index`` — two narrow columns
per tombstone whatever the table width, exact for any physical row
with no key or uniqueness precondition; the Delta/Iceberg DV design).
``vector_format="row"`` keeps the legacy FULL-ROW tombstones, whose
exactness argument is different: a deterministic predicate is a pure
function of the row's columns, so every copy of a matching tuple also
matches and killing them all is precisely DELETE's semantics — but at
one full-width row per tombstone. (Non-deterministic predicates —
``rand()``, ``current_timestamp()`` — are evaluated independently by
the discovery scan and the rewrite and are NOT supported in either
format; results would be undefined in any engine that scans twice.)

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
    spark: SparkSession,
    root: str,
    m: dict,
    candidates: list[str],
    pred,
    scope_alias: str | None = None,
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
    if scope_alias:
        cand = cand.alias(scope_alias)
    per_file = (
        cand.where(pred)
        .groupBy("__rel")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    return sorted(r["__rel"] for r in per_file), sum(r["__n"] for r in per_file)


def _vector_schemas(root: str, m: dict, rels) -> dict[str, set]:
    """Footer column sets of prior vector files, translated PHYSICAL ->
    LOGICAL through the manifest's column mapping so the fold-compat
    probe compares like with like after a RENAME COLUMN."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        logical_vector_schemas,
    )

    return logical_vector_schemas(root, m, rels)


def _fold_prior_vectors(
    spark: SparkSession, root: str, m: dict, touched: list[str], tomb: DataFrame
) -> DataFrame:
    """Shared protocol logic — see
    :func:`~implementing_scds_in_hive_spark.sources.snapshot.
    fold_prior_vectors` (per-file vector lists, per-file schema
    validation)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        fold_prior_vectors,
    )

    return fold_prior_vectors(spark, root, m, touched, tomb)


def _stats_cols(m: dict) -> list[str] | None:
    return sorted({c for fs in m.get("stats", {}).values() for c in fs}) or None


def _predicate_preamble(
    spark,
    root: str,
    predicate,
    prune: dict | None,
    op: str,
    scope_alias: str | None = None,
    resolved: tuple[int, dict] | None = None,
):
    """Shared DELETE/UPDATE front half: resolve the table, parse the
    pinned schema, stats-prune candidates, and run the one discovery
    scan. Returns ``(pred, v, m, schema, touched, report)`` — the
    per-verb code only differs in how it transforms the touched rows.
    ``scope_alias`` names the scan's scope so table-qualified
    references in the predicate (``t.col``, legal SQL) resolve.
    ``resolved`` lets a caller that already loaded ``(v, manifest)``
    (update_where's SET validation) pin THIS operation to that exact
    version — re-resolving here opened a window where a concurrent
    schema commit made the two disagree (r11 dml/sinks review)."""
    import json as _json

    from pyspark.sql.types import StructType

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    v, m = resolved if resolved is not None else _resolve(root)
    schema = StructType.fromJson(_json.loads(m["schema"]))
    candidates = _candidates(m, prune)
    touched, n_matched = _touched_files(
        spark, root, m, candidates, pred, scope_alias
    )
    report = {
        "op": op,
        "parent_version": v,
        "version": v,
        "files_total": len(m["files"]),
        "files_candidates": len(candidates),
        "files_touched": len(touched),
        "rows_matched": n_matched,
    }
    return pred, v, m, schema, touched, report


def _commit_replace(
    df,
    root: str,
    m: dict,
    v: int,
    *,
    drop_files,
    delete_vectors=None,
    app_meta=None,
):
    """The one replace-commit call every DML tier funnels through: CoW
    passes the touched files as ``drop_files``; MoR/append drop nothing
    and optionally stage vectors. ``app_meta`` commits atomically with
    the data (the Delta txnAppId/txnVersion hook — merge_stream's
    exactly-once marker rides here); the parent manifest's app_meta is
    carried forward by default and the explicit dict merges over it
    (``snapshot._merge_app_meta``), so foreign writers' markers and
    watermarks survive this commit."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        write_snapshot,
    )

    return write_snapshot(
        df,
        root,
        partition_by=list(m["partition_by"]) or None,
        mode="replace",
        expected_version=v,
        stats_cols=_stats_cols(m),
        drop_files=drop_files,
        delete_vectors=delete_vectors,
        app_meta=app_meta,
    )


def _bin_tomb(tomb: DataFrame, n_rows: int) -> DataFrame:
    """A tombstone batch inherits the touched-file scan's partitioning
    — written as-is that is one near-empty vector file per touched file
    (footer overhead dominating the payload). Rows are ~tens of bytes;
    bin at ~4M rows per vector file from the driver-known matched
    count, no shuffle."""
    return tomb.coalesce(max(1, -(-n_rows // 4_000_000)))


def _folded_rows_estimate(root: str, m: dict, touched: list[str]) -> int:
    """Upper bound on PRIOR-tombstone rows that ``_fold_prior_vectors``
    adds to this operation's batch (parquet footer ``num_rows`` over
    the touched files' vector lists — metadata reads only). Sizing
    input for :func:`_bin_tomb`: without it a DELETE matching 1M rows
    on files carrying 50M folded tombstones would coalesce 51M rows
    into one vector file (r11 dml/sinks review). Overcounts when a
    vector file also serves untouched files — more bins, never an
    oversized one."""
    import pyarrow.parquet as pq

    deletes = m.get("deletes", {})
    rels = {r for f in touched for r in deletes.get(f, []) or []}
    return sum(
        pq.ParquetFile(os.path.join(root, r)).metadata.num_rows
        for r in rels
    )


def _vector_cols(vector_format: str, data_cols: list[str]) -> list[str]:
    """Key columns (beyond ``__file``) a new vector batch will carry —
    what ``_route``'s fold-compatibility probe checks prior vectors
    against."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_POS_COL,
    )

    if vector_format not in ("pos", "row"):
        raise ValueError(
            f"vector_format must be pos|row, got {vector_format!r}"
        )
    return [DELETE_POS_COL] if vector_format == "pos" else data_cols


def delete_where(
    spark: SparkSession,
    root: str,
    predicate,
    *,
    tier: str = "auto",
    prune: dict | None = None,
    cow_max_touched_fraction: float = 0.25,
    mor_max_matched_fraction: float = 0.7,
    vector_format: str = "pos",
    scope_alias: str | None = None,
    app_meta: dict | None = None,
) -> dict:
    """``DELETE FROM <root> WHERE <predicate>`` as an atomic replace
    commit. ``predicate`` is a SQL boolean string or a ``Column``;
    ``prune`` optionally pre-narrows the candidate files from the
    manifest's per-file stats (same form as ``read_snapshot(prune=)``)
    — without it the discovery scan still only reads the predicate's
    columns, filter-pushed, so untouched files cost a footer visit.

    ``tier="auto"`` routes on the touched-file fraction: few files →
    copy-on-write (rewrite them minus the matching rows), many →
    merge-on-read (positional tombstones by default — see the module
    docstring and ``vector_format`` — no file rewritten) — EXCEPT that
    a predicate matching ≥ ``mor_max_matched_fraction`` of the touched
    files' rows (e.g. a whole-table DELETE) routes back to CoW, where
    MoR would tombstone nearly every row and leave the table all
    vector debt (see ``_route``). A table whose touched files carry
    vectors this batch's format cannot fold also
    auto-falls-back to CoW, which kills those files' vectors with the
    files. Returns ``{"op", "tier", "parent_version", "version",
    "files_total", "files_candidates", "files_touched",
    "rows_matched"}``; CAS-protected — a concurrent commit raises
    :class:`CommitConflictError` (re-run to retry on the new parent).
    """
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        DELETE_POS_COL,
        read_manifest_files,
    )

    pred, v, m, schema, touched, out = _predicate_preamble(
        spark, root, predicate, prune, "delete", scope_alias
    )
    data_cols = [f.name for f in schema.fields]
    vcols = _vector_cols(vector_format, data_cols)
    if not touched:
        return {**out, "tier": "noop"}
    tier = _route(
        root,
        m,
        touched,
        tier,
        cow_max_touched_fraction,
        vcols,
        rows_matched=out["rows_matched"],
        mor_max_matched_fraction=mor_max_matched_fraction,
    )
    if tier == "cow":
        scan = read_manifest_files(spark, root, m, touched)
        if scope_alias:
            scan = scan.alias(scope_alias)
        survivors = scan.where(
            ~F.coalesce(pred.cast("boolean"), F.lit(False))
        ).select(*[f.name for f in schema.fields])
        new_v = _commit_replace(
            survivors, root, m, v, drop_files=touched, app_meta=app_meta
        )
    else:
        pos = vector_format == "pos"
        rows = read_manifest_files(
            spark,
            root,
            m,
            touched,
            rel_path_col="__rel",
            row_pos_col=DELETE_POS_COL if pos else None,
        )
        if scope_alias:
            rows = rows.alias(scope_alias)
        tomb = rows.where(pred).select(
            F.col("__rel").alias(DELETE_FILE_COL),
            *([DELETE_POS_COL] if pos else data_cols),
        )
        tomb = _fold_prior_vectors(spark, root, m, touched, tomb)
        tomb = _bin_tomb(
            tomb,
            out["rows_matched"] + _folded_rows_estimate(root, m, touched),
        )
        empty = spark.createDataFrame([], schema)
        new_v = _commit_replace(
            empty, root, m, v, drop_files=[], delete_vectors=tomb,
            app_meta=app_meta,
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
    mor_max_matched_fraction: float = 0.7,
    vector_format: str = "pos",
    scope_alias: str | None = None,
    app_meta: dict | None = None,
) -> dict:
    """``UPDATE <root> SET col = expr, ... WHERE <predicate>`` as an
    atomic replace commit. ``set_exprs`` maps column names to SQL
    expression strings or ``Column``s evaluated against the matching
    row (self-references fine: ``{"qty": "qty + 1"}``); each result is
    cast back to the column's declared type so the table schema is
    invariant. Same tiers, routing, pruning, 3VL, CAS and
    ``vector_format`` semantics as :func:`delete_where`; the
    merge-on-read form tombstones the original matching rows and
    appends the rewritten rows as new files — O(matched rows) write
    volume however scattered the predicate."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        DELETE_POS_COL,
        read_manifest_files,
    )

    # validate the SET list from the manifest schema BEFORE the
    # discovery scan — an input error must not cost a table-wide read
    import json as _json

    resolved = _resolve(root)
    known = {
        f["name"] for f in _json.loads(resolved[1]["schema"])["fields"]
    }
    bad = sorted(set(set_exprs) - known)
    if bad:
        raise ValueError(
            f"SET references unknown columns {bad}; table has {sorted(known)}"
        )
    pred, v, m, schema, touched, out = _predicate_preamble(
        spark, root, predicate, prune, "update", scope_alias,
        resolved=resolved,
    )
    types = {f.name: f.dataType for f in schema.fields}
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e).cast(types[c])
        for c, e in set_exprs.items()
    }
    data_cols = [f.name for f in schema.fields]
    vcols = _vector_cols(vector_format, data_cols)
    if not touched:
        return {**out, "tier": "noop"}
    tier = _route(
        root,
        m,
        touched,
        tier,
        cow_max_touched_fraction,
        vcols,
        rows_matched=out["rows_matched"],
        mor_max_matched_fraction=mor_max_matched_fraction,
    )
    hit = F.coalesce(pred.cast("boolean"), F.lit(False))
    if tier == "cow":
        rows = read_manifest_files(spark, root, m, touched)
        if scope_alias:
            rows = rows.alias(scope_alias)
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
        new_v = _commit_replace(
            rewritten, root, m, v, drop_files=touched, app_meta=app_meta
        )
    else:
        pos = vector_format == "pos"
        rows = read_manifest_files(
            spark,
            root,
            m,
            touched,
            rel_path_col="__rel",
            row_pos_col=DELETE_POS_COL if pos else None,
        )
        if scope_alias:
            rows = rows.alias(scope_alias)
        matched = rows.where(pred)
        tomb = matched.select(
            F.col("__rel").alias(DELETE_FILE_COL),
            *([DELETE_POS_COL] if pos else data_cols),
        )
        tomb = _fold_prior_vectors(spark, root, m, touched, tomb)
        tomb = _bin_tomb(
            tomb,
            out["rows_matched"] + _folded_rows_estimate(root, m, touched),
        )
        updated = matched.select(
            *[
                (sets[c].alias(c) if c in sets else F.col(c))
                for c in data_cols
            ]
        )
        new_v = _commit_replace(
            updated, root, m, v, drop_files=[], delete_vectors=tomb,
            app_meta=app_meta,
        )
    return {**out, "tier": tier, "version": new_v}


def _route(
    root: str,
    m: dict,
    touched: list[str],
    tier: str,
    cow_max_touched_fraction: float,
    vector_cols: list[str],
    *,
    rows_matched: int | None = None,
    mor_max_matched_fraction: float = 0.7,
) -> str:
    """Tier policy shared by the DML verbs. ``auto`` routes on the
    touched-file fraction (the CoW write bill is the touched files; the
    MoR bill is O(matched rows) + a read overlay) — with two overrides:

    * **matched-density cap** (ADVICE r8): a predicate matching most of
      the touched files' ROWS (e.g. an unqualified ``UPDATE``: touched
      fraction 1.0, matched fraction 1.0) would make MoR append a
      near-complete copy of the table PLUS a tombstone per row and
      leave every file carrying vector debt — strictly worse than CoW.
      When ``rows_matched / rows(touched files) >=
      mor_max_matched_fraction`` the auto tier routes back to CoW. The
      denominator comes from memoized driver-side footer counts
      (O(#touched), no data read), paid only when auto already chose
      MoR. Note the cap is on ROW density, never the touched-FILE
      fraction — a uniformly-scattered 1% batch touches 100% of files
      and must stay MoR (the whole point of the tier).
    * **fold compatibility**: touched files carrying vectors this
      batch's format cannot fold (a different column set, e.g. an SCD
      merge's single-key vectors under a positional batch) route to
      CoW, which retires those vectors with their files and is
      therefore always compatible. The probe reads one parquet footer
      driver-side per DISTINCT vector file referenced by the touched
      set — vectors from different commits can have different column
      sets, so a single-file sample would mis-route."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        file_row_counts,
    )

    if tier not in ("auto", "cow", "mor"):
        raise ValueError(f"tier must be auto|cow|mor, got {tier!r}")
    if tier != "auto":
        return tier
    frac = len(touched) / max(1, len(m["files"]))
    chosen = "cow" if frac <= cow_max_touched_fraction else "mor"
    if chosen == "mor" and rows_matched is not None:
        total = sum(file_row_counts(root, touched).values())
        deletes = m.get("deletes", {})
        vec_rels = {r for f in touched for r in deletes.get(f, [])}
        if vec_rels:
            # footer totals count already-tombstoned rows — on a
            # vector-heavy table that UNDERSTATES density and lets the
            # whole-table pathology slip through the cap (r9 self-
            # review). Subtract the touched files' vector rows (same
            # memoized footer reads). The correction is approximate
            # (shared vector files / key-format multi-kill rows), so
            # clamp the denominator at rows_matched: an overshoot
            # reads as density 1.0 and errs toward CoW, the safe
            # direction exactly where the fold is overdue.
            total -= sum(file_row_counts(root, vec_rels).values())
        denom = max(total, rows_matched)
        if denom > 0 and rows_matched / denom >= mor_max_matched_fraction:
            return "cow"
    if chosen == "mor":
        deletes = m.get("deletes", {})
        want = {DELETE_FILE_COL, *vector_cols}
        rels = {r for f in touched for r in deletes.get(f, [])}
        if any(
            names != want
            for names in _vector_schemas(root, m, rels).values()
        ):
            return "cow"
    return chosen

def _assert_nbs_target_only(spark, clauses, sa, t_cols, s_cols) -> None:
    """WHEN NOT MATCHED BY SOURCE expressions evaluate on target rows
    with NO source match — every source column is NULL there, so a
    source reference in a SET value silently writes NULL and in a
    condition 3VL-no-fires. Delta/Spark MERGE rejects source references
    in NBS clauses at analysis; mirror that loudly. ``clauses`` is a
    list of (label, expr) with expr a SQL string or Column; walks each
    parsed tree for attributes qualified by the source alias, or
    unqualified attributes that resolve only against the source.
    Identifier comparison is CASE-INSENSITIVE like Spark's default
    analyzer — 'S.price' under source_alias 's' must not bypass the
    guard and silently write NULLs (r9 self-review; under
    spark.sql.caseSensitive=true this errs toward rejecting, the loud
    direction)."""

    def _attrs(e, out):
        cls = e.getClass().getSimpleName()
        if cls == "UnresolvedAttribute":
            out.append([str(x) for x in _jseq(e.nameParts())])
        elif cls == "AttributeReference":
            # a DataFrame-bound Column (src_df["c"]) arrives RESOLVED —
            # no UnresolvedAttribute node — and its exprId can survive
            # into the joined plan, so it would bypass the guard and
            # silently write NULLs (r11 dml/sinks review); apply the
            # same name rules to resolved references
            out.append(
                [str(x) for x in _jseq(e.qualifier())] + [str(e.name())]
            )
        ch = e.children()
        for i in range(ch.size()):
            _attrs(ch.apply(i), out)

    sa_l = sa.casefold()
    s_l = {c.casefold() for c in s_cols}
    t_l = {c.casefold() for c in t_cols}
    parser = spark._jsparkSession.sessionState().sqlParser()
    # classic-mode Columns wrap a ColumnNode (no .expr() since Spark
    # 4.x); the session converter yields the Catalyst expression — a
    # DataFrame-bound Column arrives as a resolved AttributeReference,
    # which _attrs inspects by the same name rules (r11 dml review)
    to_expr = getattr(
        getattr(
            spark._jvm.org.apache.spark.sql.classic,
            "ColumnNodeToExpressionConverter$",
        ),
        "MODULE$",
    )
    for label, expr in clauses:
        if expr is None or expr is True or expr is False:
            continue
        je = (
            parser.parseExpression(expr)
            if isinstance(expr, str)
            else to_expr.apply(expr._jc.node())
        )
        attrs: list[list[str]] = []
        _attrs(je, attrs)
        bad = sorted(
            ".".join(p)
            for p in attrs
            if (len(p) >= 2 and p[-2].casefold() == sa_l)
            or (
                len(p) == 1
                and p[0].casefold() in s_l
                and p[0].casefold() not in t_l
            )
        )
        if bad:
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE {label} references source "
                f"columns {bad} — these rows have no source match, so "
                f"every source column is NULL there; reference only "
                f"target ({sorted(t_cols)[:8]}...) columns"
            )


def _jseq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _normalize_chain(
    name: str,
    clauses,
    *,
    scalar_update,
    scalar_update_condition,
    scalar_delete,
) -> list[dict]:
    """Normalize a WHEN MATCHED / WHEN NOT MATCHED BY SOURCE clause
    family to ONE canonical form: an ordered list of
    ``{"action": "update"|"delete", "condition": ..., "set": {...}}``
    evaluated FIRST-MATCH-WINS (the SQL rule). The scalar sugar maps to
    the chain ``[delete(cond), update(update_condition)]`` — exactly
    the legacy semantics (delete evaluated first; the update applies to
    matched rows the delete did not claim AND satisfying its gate)."""
    if clauses is not None:
        if (
            scalar_update is not None
            or scalar_update_condition is not None
            or scalar_delete is not None
        ):
            raise ValueError(
                f"pass {name}= or its scalar forms, not both"
            )
        out = []
        for cl in clauses:
            if not isinstance(cl, dict) or cl.get("action") not in (
                "update",
                "delete",
            ):
                raise ValueError(
                    f"{name} clauses need action='update'|'delete'; "
                    f"got {cl!r}"
                )
            unknown = set(cl) - {"action", "condition", "set"}
            if unknown:
                raise ValueError(
                    f"{name} clause has unknown keys {sorted(unknown)}"
                )
            if cl["action"] == "update" and not cl.get("set"):
                raise ValueError(
                    f"{name} update clause needs a non-empty set="
                )
            if cl["action"] == "delete" and cl.get("set"):
                raise ValueError(
                    f"{name} delete clause cannot carry set="
                )
            out.append(
                {
                    "action": cl["action"],
                    "condition": cl.get("condition"),
                    "set": dict(cl.get("set") or {}),
                }
            )
        return out
    out = []
    if scalar_delete is not None:
        out.append(
            {
                "action": "delete",
                "condition": None if scalar_delete is True else scalar_delete,
                "set": {},
            }
        )
    if scalar_update:
        out.append(
            {
                "action": "update",
                "condition": scalar_update_condition,
                "set": dict(scalar_update),
            }
        )
    return out


def _normalize_inserts(clauses, scalar_values, scalar_condition) -> list[dict]:
    """Normalize the WHEN NOT MATCHED family to an ordered
    first-match-wins list of ``{"condition": ..., "values":
    "all"|{col: expr}}``; an unmatched source row firing NO clause is
    not inserted."""
    if clauses is not None:
        # None (disable scalar inserts) and the untouched "all" default
        # both carry no conflicting insert spec — only an explicit
        # column mapping alongside the list is ambiguous
        if scalar_values not in (None, "all") or scalar_condition is not None:
            raise ValueError(
                "pass when_not_matched= or when_not_matched_insert=, "
                "not both"
            )
        out = []
        for cl in clauses:
            if not isinstance(cl, dict):
                raise ValueError(
                    f"when_not_matched clauses are dicts; got {cl!r}"
                )
            unknown = set(cl) - {"condition", "values"}
            if unknown:
                raise ValueError(
                    f"when_not_matched clause has unknown keys "
                    f"{sorted(unknown)}"
                )
            vals = cl.get("values", "all")
            if vals != "all":
                vals = dict(vals)
                if not vals:
                    raise ValueError(
                        "when_not_matched values= must be 'all' or a "
                        "non-empty {column: expr} dict"
                    )
            out.append({"condition": cl.get("condition"), "values": vals})
        return out
    if scalar_values is None:
        if scalar_condition is not None:
            raise ValueError(
                "insert_condition given but when_not_matched_insert is "
                "None"
            )
        return []
    return [
        {
            "condition": scalar_condition,
            "values": (
                scalar_values
                if scalar_values == "all"
                else dict(scalar_values)
            ),
        }
    ]


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    on: list[str],
    *,
    when_matched_update: dict | None = None,
    when_matched_delete=None,
    when_not_matched_insert="all",
    update_condition=None,
    insert_condition=None,
    when_not_matched_by_source_update: dict | None = None,
    when_not_matched_by_source_delete=None,
    not_matched_by_source_condition=None,
    when_matched: list | None = None,
    when_not_matched: list | None = None,
    when_not_matched_by_source: list | None = None,
    tier: str = "auto",
    cow_max_touched_fraction: float = 0.25,
    mor_max_matched_fraction: float = 0.7,
    broadcast_source: bool = True,
    validate_source_unique: bool = True,
    vector_format: str = "pos",
    target_alias: str = "t",
    source_alias: str = "s",
    app_meta: dict | None = None,
    expected_version: int | None = None,
) -> dict:
    """Executable generic ``MERGE INTO <root> USING <source> ON
    <equi-keys>`` — the Delta/Iceberg upsert verb, routed through the
    same CoW/MoR tiers as the other DML verbs.
    (``operators/merge_sql.py`` GENERATES lakehouse MERGE SQL for the
    SCD2 shape; this one EXECUTES an arbitrary merge against the repo's
    own snapshot protocol.)

    Clauses come in TWO equivalent forms. The LIST form is full Delta
    parity — first-match-wins chains in statement order:

    * ``when_matched=[{"action": "update"|"delete", "condition":
      <bool SQL | None>, "set": {col: expr}}, ...]`` — each matched
      row fires exactly the FIRST clause whose condition is TRUE
      (3VL: a NULL condition does not claim the row);
    * ``when_not_matched=[{"condition": ..., "values": "all"|{col:
      expr}}, ...]`` — first-match-wins inserts; an unmatched source
      row firing no clause is not inserted;
    * ``when_not_matched_by_source=[...]`` — same shape as
      ``when_matched``, over target rows with no source key.

    The scalar sugar below normalizes to single-clause chains (the
    delete evaluated first, exactly the legacy semantics); passing a
    family's list AND its scalars raises. Scalar clauses (any subset,
    at least one across all families):

    * ``when_matched_delete`` — ``True`` or a boolean SQL string over
      ``t.``/``s.``-qualified columns: matched target rows satisfying
      it are deleted. Evaluated FIRST, like a Delta ``WHEN MATCHED
      THEN DELETE`` listed before the update clause.
    * ``when_matched_update`` — ``{target_col: expr}`` with exprs over
      ``t.``/``s.``; applied to matched rows that survived the delete
      clause and satisfy ``update_condition`` (optional boolean, over
      ``t.``/``s.``). Results cast back to the column's declared type;
      ON keys cannot be updated.
    * ``when_not_matched_insert`` — ``"all"`` (source columns by
      target name; the source must provide every target column) or
      ``{target_col: expr}`` over ``s.`` (omitted columns insert
      NULL). ``None`` disables inserts. ``insert_condition``
      (optional boolean over ``s.`` columns only, 3VL: only TRUE
      inserts) gates the clause — ANSI/Delta ``WHEN NOT MATCHED AND
      <cond> THEN INSERT``; a ``t.`` reference fails analysis loudly
      (not-matched rows have no target side).
    * ``when_not_matched_by_source_delete`` / ``..._update`` (+
      ``not_matched_by_source_condition`` gating the update) — the
      Delta ``WHEN NOT MATCHED BY SOURCE`` clauses: applied to TARGET
      rows whose key has no source match. Expressions must reference
      ``t.`` columns only — source columns are NULL on these rows, so a
      source reference would silently write NULLs (SET) or 3VL-no-fire
      (conditions); like Delta's MERGE, these clauses reject source
      references up front (loudly, before any scan). NOTE the
      inherent cost: these clauses reach the WHOLE table, so discovery
      becomes one full-candidate scan + join instead of the
      source-bounds prune + semi-join — exactly the trade a lakehouse
      MERGE makes. Write volume stays O(affected) on the MoR tier.

    Expressions are resolved by Spark against the aliased
    target/source join, so qualification is real scoping, not string
    rewriting — an unqualified ambiguous reference fails analysis
    loudly. ``target_alias``/``source_alias`` (default ``t``/``s``)
    rename the scopes — how the SQL face passes statements whose MERGE
    aliases the user chose. ``on`` is an equi-key list (null-unsafe, ANSI MERGE: NULL
    keys match nothing). A source with DUPLICATE keys would match one
    target row to several source rows — ambiguous; with
    ``validate_source_unique`` (default) that raises up front, the
    same error a lakehouse MERGE gives at runtime.

    Candidate files are stats-pruned by the source's key bounds
    driver-side, then narrowed to files actually containing a source
    key by one column-pruned semi-join — identical discovery to
    :func:`operators.scd.scd2_merge_cow`. Conditions follow 3VL (only
    TRUE fires a clause). Same CAS discipline and tier routing as
    :func:`delete_where` (including ``vector_format``): CoW rewrites
    the touched files; MoR tombstones affected rows (positional
    vectors by default) and appends updated + inserted rows —
    O(affected + inserted) write volume however scattered the keys.

    Returns ``{"op", "tier", "parent_version", "version",
    "files_total", "files_candidates", "files_touched",
    "rows_updated", "rows_deleted", "rows_inserted"}``. ``app_meta``
    commits atomically with the merge (the Delta txnAppId/txnVersion
    hook — how ``streaming/dml_stream.py:merge_stream`` gets
    exactly-once replay); the parent's app_meta is carried forward BY
    DEFAULT, with the explicit dict merging over it one level deep
    (``snapshot._merge_app_meta`` — Delta's SetTransaction
    accumulation), so a merge with ``app_meta=None`` can no longer
    erase another stream's marker or a matview watermark. A caller
    whose explicit value must win against a concurrent writer's (e.g.
    a marker read from a specific version) should still pass
    ``expected_version`` = the version it read FROM, so the race fails
    loudly (:class:`CommitConflictError`; re-read and retry) instead
    of committing stale metadata.

    ``mor_max_matched_fraction`` (auto tier only): when the discovery
    semi-join's KEY-matched row count reaches this fraction of the
    touched files' live rows, auto routes back to CoW — MoR on a
    near-whole-table merge would append ~a full copy plus a tombstone
    per row. NOTE the signal is KEY-match density, measured BEFORE
    clause conditions run: a key-dense merge whose WHEN conditions
    fire sparsely is also routed to CoW (a full rewrite of the touched
    files where MoR would have written only the fired rows). That
    over-approximation is deliberate — routing from clause-fired
    counts would need the classification join BEFORE the tier choice
    (forcing position capture on every CoW merge); if you know your
    conditions are sparse, pass ``tier="mor"`` explicitly.
    ``tier`` is the
    routed ``cow``/``mor``, or ``append`` (inserts only — no touched
    file changes, so a pure append commit carries everything by
    reference), or ``noop`` (no clause fired: nothing is committed and
    no version is burned)."""
    from pyspark.storagelevel import StorageLevel

    from implementing_scds_in_hive_spark.sources.snapshot import (
        DELETE_FILE_COL,
        DELETE_POS_COL,
        read_manifest_files,
    )

    matched_clauses = _normalize_chain(
        "when_matched",
        when_matched,
        scalar_update=when_matched_update,
        scalar_update_condition=update_condition,
        scalar_delete=when_matched_delete,
    )
    insert_clauses = _normalize_inserts(
        when_not_matched, when_not_matched_insert, insert_condition
    )
    nbs_clauses = _normalize_chain(
        "when_not_matched_by_source",
        when_not_matched_by_source,
        scalar_update=when_not_matched_by_source_update,
        scalar_update_condition=not_matched_by_source_condition,
        scalar_delete=when_not_matched_by_source_delete,
    )
    if not matched_clauses and not insert_clauses and not nbs_clauses:
        raise ValueError("merge_into needs at least one WHEN clause")
    v, m = _resolve(root)
    if expected_version is not None and v != expected_version:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            CommitConflictError,
        )

        raise CommitConflictError(
            f"expected version {expected_version} but table is at {v}"
        )
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(m["schema"]))
    t_cols = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}
    if not on or not set(on) <= set(t_cols):
        raise ValueError(f"on={on!r} must be non-empty target columns")
    if not set(on) <= set(source.columns):
        raise ValueError(f"on={on!r} missing from source {source.columns}")
    for cl in matched_clauses + nbs_clauses:
        if cl["action"] != "update":
            continue
        bad = sorted(set(cl["set"]) - set(t_cols))
        if bad:
            raise ValueError(f"SET references unknown columns {bad}")
        if set(cl["set"]) & set(on):
            raise ValueError("updating an ON key column is not supported")
    nbs = bool(nbs_clauses)
    if nbs:
        probes = []
        for i, cl in enumerate(nbs_clauses):
            tag = f" (clause {i})" if len(nbs_clauses) > 1 else ""
            probes.extend(
                (f"SET {c}{tag}", e) for c, e in cl["set"].items()
            )
            lbl = (
                "DELETE condition" if cl["action"] == "delete" else "condition"
            )
            probes.append((f"{lbl}{tag}", cl["condition"]))
        _assert_nbs_target_only(
            spark,
            probes,
            source_alias,
            set(t_cols),
            set(source.columns),
        )
    for cl in insert_clauses:
        if cl["values"] == "all":
            missing = sorted(set(t_cols) - set(source.columns))
            if missing:
                raise ValueError(
                    f'insert="all" needs every target column in the '
                    f"source; missing {missing}"
                )
        else:
            bad = sorted(set(cl["values"]) - set(t_cols))
            if bad:
                raise ValueError(f"INSERT references unknown columns {bad}")

    def _cond(c):
        if c is None or c is False:
            return F.lit(False)
        if c is True:
            return F.lit(True)
        e = F.expr(c) if isinstance(c, str) else c
        return F.coalesce(e.cast("boolean"), F.lit(False))

    def _expr(e):
        return F.expr(e) if isinstance(e, str) else e

    src = source.persist(StorageLevel.MEMORY_AND_DISK)
    inserts = None
    try:
        keyed = src.where(
            F.expr(" AND ".join(f"{c} IS NOT NULL" for c in on))
        )
        if validate_source_unique:
            if keyed.groupBy(*on).count().where("count > 1").limit(1).count():
                raise ValueError(
                    "multiple source rows share an ON key — a target row "
                    "would match more than one source row (ambiguous "
                    "MERGE); pre-aggregate the source or pass "
                    "validate_source_unique=False at your own risk"
                )
        bounds = keyed.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.min(c).alias(f"lo_{c}") for c in on],
            *[F.max(c).alias(f"hi_{c}") for c in on],
        ).first()

        def _tz_bound(val):
            # Spark collects TIMESTAMP values as NAIVE datetimes in the
            # SESSION time zone; footer stats are naive UTC. Attach the
            # session zone so the prune compares in one frame — under a
            # non-UTC session a naive compare would shift the window by
            # the offset and silently mis-prune boundary files.
            import datetime as _dt

            if isinstance(val, _dt.datetime) and val.tzinfo is None:
                try:
                    from zoneinfo import ZoneInfo

                    return val.replace(
                        tzinfo=ZoneInfo(
                            spark.conf.get("spark.sql.session.timeZone")
                        )
                    )
                except Exception:
                    return val
            return val

        out = {
            "op": "merge",
            "parent_version": v,
            "version": v,
            "files_total": len(m["files"]),
        }
        candidates = (
            _candidates(
                m,
                {
                    c: (
                        _tz_bound(bounds[f"lo_{c}"]),
                        _tz_bound(bounds[f"hi_{c}"]),
                    )
                    for c in on
                },
            )
            if bounds["n"]
            else []
        )
        if nbs:
            # NOT MATCHED BY SOURCE rows can sit in ANY file — the
            # source-bounds prune and semi-join discovery don't apply;
            # touched files fall out of the classification itself
            candidates = list(m["files"])
        out["files_candidates"] = len(candidates)
        touched: list[str] = []
        n_key_matched = 0
        if candidates and not nbs:
            cand = read_manifest_files(
                spark, root, m, candidates, rel_path_col="__rel"
            )
            # the discovery semi-join honors broadcast_source too: the
            # distinct key set of a huge source is itself ~source-sized,
            # and force-broadcasting it would OOM the driver on exactly
            # the workloads the flag exists for
            keys = keyed.select(*on).distinct()
            if broadcast_source:
                keys = F.broadcast(keys)
            # one grouped collect (O(#touched files), never rows) yields
            # the touched list AND the key-matched row count — the auto
            # router's matched-density signal
            per_file = (
                cand.select(*on, "__rel")
                .join(keys, on, "left_semi")
                .groupBy("__rel")
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            touched = sorted(r["__rel"] for r in per_file)
            n_key_matched = sum(r["__n"] for r in per_file)
        out["files_touched"] = len(touched)
        if not nbs and not touched and not insert_clauses:
            return {
                **out,
                "tier": "noop",
                "rows_updated": 0,
                "rows_deleted": 0,
                "rows_inserted": 0,
            }
        vcols = _vector_cols(vector_format, t_cols)
        if nbs:
            # tier is routed AFTER classification (touched unknown yet);
            # capture positions up front whenever the format may need
            # them — an EXPLICIT cow tier never will
            tier_req = tier
            capture_pos = vector_format == "pos" and tier != "cow"
        else:
            # the matched-density signal here is KEY-match density (the
            # discovery semi-join's row count): clause conditions may
            # fire on fewer rows, so the cap over-approximates toward
            # CoW exactly for whole-table-key merges (the shape the cap
            # exists for); a key-dense merge whose conditions fire
            # sparsely should pass tier="mor" explicitly
            tier = _route(
                root,
                m,
                touched,
                tier,
                cow_max_touched_fraction,
                vcols,
                rows_matched=n_key_matched,
                mor_max_matched_fraction=mor_max_matched_fraction,
            )
            capture_pos = vector_format == "pos" and tier == "mor"
        pos = capture_pos

        # One aliased left join; every clause expression resolves its
        # t./s. qualifiers against REAL scopes, so ambiguity is an
        # analysis error, not a silent capture.
        t_rows = read_manifest_files(
            spark,
            root,
            m,
            candidates if nbs else touched,
            rel_path_col="__rel",
            row_pos_col=DELETE_POS_COL if pos else None,
        )
        s_side = src.withColumn("__s_exists", F.lit(True))
        if broadcast_source:
            s_side = F.broadcast(s_side)
        ta, sa = target_alias, source_alias
        if not ta or not sa or ta == sa:
            raise ValueError(
                f"target_alias/source_alias must be distinct non-empty "
                f"names, got {ta!r}/{sa!r}"
            )
        joined = t_rows.alias(ta).join(
            s_side.alias(sa),
            [F.col(f"{ta}.{c}") == F.col(f"{sa}.{c}") for c in on],
            "left",
        )
        matched = F.col(f"{sa}.__s_exists").isNotNull()

        def _fired(clauses, gate):
            """First-match-wins clause index over a gate (NULL when no
            clause fires) — the CASE chain IS the SQL textual-order
            rule, and 3VL falls out of _cond (a NULL condition does not
            claim the row, the next clause may)."""
            expr = None
            for i, cl in enumerate(clauses):
                c = gate & (
                    F.lit(True)
                    if cl["condition"] is None
                    else _cond(cl["condition"])
                )
                expr = (F.when if expr is None else expr.when)(c, F.lit(i))
            return expr

        m_fired = _fired(matched_clauses, matched)
        nbs_fired = _fired(nbs_clauses, ~matched)

        def _hits(fired, clauses, action):
            idx = [
                i for i, cl in enumerate(clauses) if cl["action"] == action
            ]
            if fired is None or not idx:
                return F.lit(False)
            return F.coalesce(fired.isin(idx), F.lit(False))

        # the matched and by-source chains fold into ONE delete flag and
        # ONE per-column rewrite (each row fires at most one clause of
        # one chain, so the CASE chains are exact) — everything
        # downstream (counts, CoW survivors, MoR tombstones, rewritten
        # rows) is clause-agnostic
        del_hit = _hits(m_fired, matched_clauses, "delete") | _hits(
            nbs_fired, nbs_clauses, "delete"
        )
        upd_hit = _hits(m_fired, matched_clauses, "update") | _hits(
            nbs_fired, nbs_clauses, "update"
        )
        upd_cols = sorted(
            {
                c
                for cl in matched_clauses + nbs_clauses
                if cl["action"] == "update"
                for c in cl["set"]
            }
        )

        def _new_val(c):
            e = F.col(f"{ta}.{c}")
            expr = None
            for fired, clauses in (
                (m_fired, matched_clauses),
                (nbs_fired, nbs_clauses),
            ):
                if fired is None:
                    continue
                for i, cl in enumerate(clauses):
                    if cl["action"] != "update" or c not in cl["set"]:
                        # a clause not setting c falls to the otherwise
                        # (identity) — emitting a branch would just
                        # bloat the per-column CASE
                        continue
                    val = _expr(cl["set"][c]).cast(types[c])
                    expr = (F.when if expr is None else expr.when)(
                        fired == F.lit(i), val
                    )
            if expr is None:
                return e.cast(types[c])
            return expr.otherwise(e.cast(types[c]))
        classified = joined.select(
            *[F.col(f"{ta}.{c}").alias(c) for c in t_cols],
            *[_new_val(c).alias(f"__new_{c}") for c in upd_cols],
            F.col(f"{ta}.__rel").alias("__rel"),
            *(
                [F.col(f"{ta}.{DELETE_POS_COL}").alias(DELETE_POS_COL)]
                if pos
                else []
            ),
            del_hit.alias("__del"),
            upd_hit.alias("__upd"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            counts = classified.agg(
                F.sum(F.col("__del").cast("long")).alias("d"),
                F.sum(F.col("__upd").cast("long")).alias("u"),
            ).first()
            rows_deleted = int(counts["d"] or 0)
            rows_updated = int(counts["u"] or 0)
            if nbs:
                touched = sorted(
                    r["__rel"]
                    for r in classified.where(
                        F.col("__del") | F.col("__upd")
                    )
                    .select("__rel")
                    .distinct()
                    .collect()
                )
                out["files_touched"] = len(touched)
                tier = _route(
                    root,
                    m,
                    touched,
                    tier_req,
                    cow_max_touched_fraction,
                    vcols,
                    rows_matched=rows_deleted + rows_updated,
                    mor_max_matched_fraction=mor_max_matched_fraction,
                )
                if tier == "mor" and vector_format == "pos" and not pos:
                    raise AssertionError("pos capture invariant")
            rows_inserted = 0
            if insert_clauses:
                unmatched = src.join(
                    classified.select(*on).distinct(), on, "left_anti"
                ).alias(sa)
                ins_fired = _fired(insert_clauses, F.lit(True))

                def _ins_val(c):
                    expr = None
                    for i, cl in enumerate(insert_clauses):
                        val = (
                            F.col(f"{sa}.{c}").cast(types[c])
                            if cl["values"] == "all"
                            else (
                                _expr(cl["values"][c]).cast(types[c])
                                if c in cl["values"]
                                else F.lit(None).cast(types[c])
                            )
                        )
                        expr = (F.when if expr is None else expr.when)(
                            F.col("__ins") == F.lit(i), val
                        )
                    return expr.otherwise(F.lit(None).cast(types[c])).alias(c)

                # __ins is computed under the sa alias (clause conditions
                # are s.-qualified), then the frame is RE-aliased so the
                # value projections' s. references still resolve
                inserts = (
                    unmatched.withColumn("__ins", ins_fired)
                    .alias(sa)
                    .where(F.col("__ins").isNotNull())
                    .select(*[_ins_val(c) for c in t_cols])
                )
                inserts = inserts.persist(StorageLevel.MEMORY_AND_DISK)
                rows_inserted = inserts.count()
            if rows_deleted + rows_updated + rows_inserted == 0:
                # keys may match yet no clause fire (update_condition
                # never TRUE, no insert clause): committing would rewrite
                # touched files byte-identically and wake change-feed
                # consumers for an empty diff
                return {
                    **out,
                    "tier": "noop",
                    "rows_updated": 0,
                    "rows_deleted": 0,
                    "rows_inserted": 0,
                }
            if rows_deleted + rows_updated == 0:
                # inserts only: nothing in the touched files changes, so
                # neither rewriting them (CoW) nor vectoring them (MoR)
                # is needed — a pure append commit carries every parent
                # file by reference
                tier = "append"

            def _final(c):
                if c in upd_cols:
                    return (
                        F.when(F.col("__upd"), F.col(f"__new_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                    )
                return F.col(c)

            if tier == "cow":
                surv_base = (
                    classified.where(F.col("__rel").isin(touched))
                    if nbs
                    else classified
                )
                survivors = surv_base.where(~F.col("__del")).select(
                    *[_final(c) for c in t_cols]
                )
                new_data = (
                    survivors.unionByName(inserts)
                    if inserts is not None
                    else survivors
                )
                new_v = _commit_replace(
                    new_data, root, m, v, drop_files=touched,
                    app_meta=app_meta,
                )
            else:
                tomb = None
                if rows_deleted + rows_updated:
                    tomb = classified.where(
                        F.col("__del") | F.col("__upd")
                    ).select(
                        F.col("__rel").alias(DELETE_FILE_COL),
                        *([DELETE_POS_COL] if pos else t_cols),
                    )
                    tomb = _fold_prior_vectors(spark, root, m, touched, tomb)
                    tomb = _bin_tomb(
                        tomb,
                        rows_deleted
                        + rows_updated
                        + _folded_rows_estimate(root, m, touched),
                    )
                rewritten = classified.where(F.col("__upd")).select(
                    *[
                        (
                            F.col(f"__new_{c}").alias(c)
                            if c in upd_cols
                            else F.col(c)
                        )
                        for c in t_cols
                    ]
                )
                new_data = (
                    rewritten.unionByName(inserts)
                    if inserts is not None
                    else rewritten
                )
                new_v = _commit_replace(
                    new_data, root, m, v, drop_files=[],
                    delete_vectors=tomb, app_meta=app_meta,
                )
            return {
                **out,
                "tier": tier,
                "version": new_v,
                "rows_updated": rows_updated,
                "rows_deleted": rows_deleted,
                "rows_inserted": rows_inserted,
            }
        finally:
            classified.unpersist()
            if inserts is not None:
                inserts.unpersist()
    finally:
        src.unpersist()


def restore_version(
    spark: SparkSession,
    root: str,
    version: int,
    *,
    expected_version: int | None = None,
    rewrite: bool = False,
) -> int:
    """``RESTORE TABLE <root> TO VERSION AS OF <version>`` — commit a
    NEW version whose content equals the historical one (roll-forward
    restore, like Delta's: history is preserved, the restore is itself
    a commit that a second restore can undo).

    Default is the CARRY-BY-REFERENCE restore
    (:func:`~implementing_scds_in_hive_spark.sources.snapshot.
    restore_commit`): the retained manifest's files are adopted into a
    new manifest — O(manifest) however large the table (a re-publishing
    restore of a 100 TB table would rewrite 100 TB that is still on
    disk). ``rewrite=True`` keeps the materializing form: a full
    re-publish of the pinned read, which drops every dependence on the
    historical stage dirs (e.g. before a deep vacuum). Returns the new
    version."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        load_manifest,
        read_snapshot,
        restore_commit,
        write_snapshot,
    )

    if not rewrite:
        return restore_commit(
            root, version, expected_version=expected_version
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
        # adopt the historical manifest's app_meta exactly like the
        # carry-by-reference restore_commit does — dropping it would
        # silently force e.g. a full matview rebuild (the refresh loop
        # keys off app_meta watermarks)
        app_meta={
            **(m.get("app_meta") or {}),
            "restored_from_version": version,
        },
    )
