"""Textual SQL face for the snapshot-table DML and maintenance verbs:
``run_sql(spark, statement, tables)`` executes the lakehouse SQL
surface — ``DELETE`` / ``UPDATE`` / ``MERGE INTO`` / ``INSERT INTO``
(Spark's own grammar) plus the Delta-style maintenance statements
(``RESTORE`` / ``VACUUM`` / ``OPTIMIZE``) — against this repo's
snapshot protocol.

Spark-first by construction: the statement is parsed by SPARK'S SQL
parser (``sessionState().sqlParser().parsePlan``), and every
condition / assignment / clause expression is carried as the parsed
tree's own ``Expression.sql()`` rendering straight back into
``F.expr`` — so expression semantics (3VL, casts, functions) are
Catalyst's end to end, never a re-implementation. This module only
maps the STATEMENT shape onto the executable verbs
(:mod:`~implementing_scds_in_hive_spark.operators.dml`,
``sources/sinks``, ``sources/snapshot``), which carry the tiers,
routing, CAS discipline and deletion-vector formats.

``tables`` maps statement-level table names to snapshot roots (str) —
or, for a MERGE source, optionally a DataFrame. Names are looked up by
their dotted form (``db.tbl`` keys match ``MERGE INTO db.tbl``).

Reference anchor: the reference IS a SQL script (SCD_script.txt) —
this face is what lets a user drive the engine's write verbs the same
way, in SQL text, while the engine keeps its manifest-commit
semantics.
"""

from __future__ import annotations

import os
import re
import weakref

from pyspark.sql import DataFrame, SparkSession

from implementing_scds_in_hive_spark.operators.dml import (
    delete_where,
    merge_into,
    restore_version,
    update_where,
)

_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<t>[\w.]+)\s+TO\s+"
    r"(VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<t>[\w.]+)"
    r"(\s+RETAIN\s+(?P<h>\d+(\.\d+)?)\s+HOURS)?"
    r"(\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
    re.IGNORECASE,
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<t>[\w.]+)\s*;?\s*$",
    re.IGNORECASE,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<t>[\w.]+)"
    r"(\s+APPLY\s*\(\s*(?P<purge>PURGE)\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<t>[\w.]+)\s*;?\s*$",
    re.IGNORECASE,
)
_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<d>[\w.]+)\s+SHALLOW\s+CLONE\s+"
    r"(?P<s>[\w.]+)(\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?"
    r"(\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?\s*;?\s*$",
    re.IGNORECASE,
)
_LIKE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<d>[\w.]+)\s+LIKE\s+"
    r"(?P<s>[\w.]+)(\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?"
    r"(\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?\s*;?\s*$",
    re.IGNORECASE,
)


def _strip_leading_comments(statement: str) -> str:
    """Drop leading ``--`` line comments and ``/* */`` blocks so the
    ^-anchored maintenance-verb regexes (RESTORE/VACUUM/OPTIMIZE/
    DESCRIBE/SHALLOW CLONE) see the verb — Spark's parser tolerates a
    leading comment but the regex face didn't (r11: a commented
    ``CREATE TABLE ... SHALLOW CLONE`` inside a script fell through to
    the parser and died on PARSE_SYNTAX_ERROR). Block comments NEST in
    Spark's grammar (SPARK-28880) — tracked by depth exactly like
    ``split_sql_statements`` does. Only the regex match uses the
    stripped form; the original text goes to Spark."""
    i, n = 0, len(statement)
    while i < n:
        ch = statement[i]
        if ch.isspace():
            i += 1
        elif statement.startswith("--", i):
            j = statement.find("\n", i)
            i = n if j < 0 else j + 1
        elif statement.startswith("/*", i):
            depth, i = 1, i + 2
            while i < n and depth:
                if statement.startswith("/*", i):
                    depth, i = depth + 1, i + 2
                elif statement.startswith("*/", i):
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
        else:
            break
    return statement[i:]


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _ts_string_to_epoch(spark, raw: str, context: str) -> float:
    """TIMESTAMP-string -> epoch seconds, evaluated BY Catalyst (one
    driver-side row) so the session time zone is honored exactly as a
    commit timestamp is; shared by the table_changes TVF bounds and
    SHALLOW CLONE's TIMESTAMP AS OF. Raises the caller's own error via
    TRY_CAST instead of a raw cast traceback."""
    micros = spark.sql(
        "SELECT unix_micros(TRY_CAST(? AS TIMESTAMP)) AS t", args=[raw]
    ).first()["t"]
    if micros is None:
        raise ValueError(f"{context}: {raw!r} is not a timestamp")
    return micros / 1e6


def _opt(o):
    """scala Option -> value or None (some plan fields are raw
    expressions, not Options — pass those through)."""
    if o is None:
        return None
    if hasattr(o, "isEmpty"):
        return None if o.isEmpty() else o.get()
    return o


def _name_of(rel) -> tuple[str, str]:
    """(dotted table name, alias) of a parsed relation: a bare
    ``UnresolvedRelation`` is its own alias (last name part), an
    explicit ``... AS x`` wraps it in a SubqueryAlias."""
    cls = rel.getClass().getSimpleName()
    if cls == "SubqueryAlias":
        child = rel.child()
        if child.getClass().getSimpleName() != "UnresolvedRelation":
            raise ValueError(
                "only plain table references are supported here "
                f"(got {child.getClass().getSimpleName()})"
            )
        name = ".".join(str(x) for x in _seq(child.multipartIdentifier()))
        return name, str(rel.identifier().name())
    if cls == "UnresolvedRelation":
        parts = [str(x) for x in _seq(rel.multipartIdentifier())]
        return ".".join(parts), parts[-1]
    raise ValueError(f"unsupported relation shape {cls}")


def _root_for(tables: dict, name: str) -> str:
    if name not in tables:
        raise KeyError(
            f"statement references table {name!r}; register its snapshot "
            f"root in tables= (have {sorted(tables)})"
        )
    root = tables[name]
    if not isinstance(root, str):
        raise TypeError(
            f"tables[{name!r}] must be a snapshot root path for a write "
            f"target (a DataFrame is only valid as a MERGE source)"
        )
    return root


def _equi_keys(cond, t_alias: str, s_alias: str) -> list[tuple[str, str]]:
    """Walk the parsed ON condition: a conjunction of
    ``t.col = s.col`` equalities (either side order) — the executable
    merge's equi-key contract. Returns (target_col, source_col) pairs;
    anything else raises with the offending fragment."""
    cls = cond.getClass().getSimpleName()
    if cls == "And":
        return _equi_keys(cond.left(), t_alias, s_alias) + _equi_keys(
            cond.right(), t_alias, s_alias
        )
    if cls != "EqualTo":
        raise ValueError(
            f"MERGE ON must be a conjunction of t.col = s.col "
            f"equalities; got {cond.sql()}"
        )

    def attr(side):
        if side.getClass().getSimpleName() != "UnresolvedAttribute":
            raise ValueError(
                f"MERGE ON sides must be plain columns; got {side.sql()}"
            )
        return [str(x) for x in _seq(side.nameParts())]

    l, r = attr(cond.left()), attr(cond.right())
    quals = {t_alias: None, s_alias: None}
    for parts in (l, r):
        q = parts[-2] if len(parts) >= 2 else None
        if q not in quals or quals[q] is not None:
            raise ValueError(
                f"MERGE ON equality must pair the target and source "
                f"aliases exactly once each; got {cond.sql()}"
            )
        quals[q] = parts[-1]
    return [(quals[t_alias], quals[s_alias])]


def _assign_key(assignment, allowed_quals: set[str]) -> str:
    """Column name of a SET assignment key. A qualified key
    (``SET t.col = ...``) is legal SQL — resolve it when the qualifier
    is the statement's own table/alias, refuse anything else loudly
    (``.sql()``-and-strip would mangle backticked qualifiers into
    nonsense column names)."""
    k = assignment.key()
    if k.getClass().getSimpleName() != "UnresolvedAttribute":
        raise ValueError(f"unsupported SET key {k.sql()}")
    parts = [str(x) for x in _seq(k.nameParts())]
    if len(parts) == 1:
        return parts[0]
    if len(parts) == 2 and parts[0] in allowed_quals:
        return parts[1]
    raise ValueError(
        f"SET key {'.'.join(parts)} must be a column of the target "
        f"table (qualifier in {sorted(allowed_quals)})"
    )


def _run_merge(spark, plan, tables: dict, opts: dict) -> dict:
    t_name, t_alias = _name_of(plan.targetTable())
    root = _root_for(tables, t_name)
    src_rel = plan.sourceTable()
    s_cls = src_rel.getClass().getSimpleName()
    if (
        s_cls == "SubqueryAlias"
        and src_rel.child().getClass().getSimpleName()
        != "UnresolvedRelation"
    ):
        # MERGE ... USING (SELECT ...) AS s: analyze the subquery via
        # the same Dataset.ofRows path INSERT uses (registered tables
        # become temp views for the analysis, saved/restored after)
        s_alias = str(src_rel.identifier().name())
        src = _materialize_query(spark, src_rel.child(), tables)
    elif s_cls in ("UnresolvedRelation", "SubqueryAlias"):
        s_name, s_alias = _name_of(src_rel)
        src = tables.get(s_name)
        if src is None:
            raise KeyError(
                f"MERGE source {s_name!r} not registered in tables="
            )
        if isinstance(src, str):
            from implementing_scds_in_hive_spark.sources.snapshot import (
                read_table,
            )

            src = read_table(spark, src)
    else:
        raise ValueError(
            f"MERGE USING takes a registered table or an aliased "
            f"subquery (USING (SELECT ...) AS s); got {s_cls}"
        )
    def _chain(actions, family):
        """Parsed WHEN clauses -> the executable merge's first-match-
        wins chain, in TEXTUAL ORDER (the engine evaluates the list in
        order, so SQL's first-match-wins rule maps one-to-one — no
        condition rewriting needed)."""
        out = []
        for a in _seq(actions):
            cls = a.getClass().getSimpleName()
            c = _opt(a.condition())
            cond = None if c is None else c.sql()
            if cls == "DeleteAction":
                out.append({"action": "delete", "condition": cond})
            elif cls == "UpdateAction":
                out.append(
                    {
                        "action": "update",
                        "condition": cond,
                        "set": {
                            _assign_key(g, {t_alias, t_name}): g.value().sql()
                            for g in _seq(a.assignments())
                        },
                    }
                )
            else:
                raise ValueError(f"unsupported {family} action {cls}")
        return out

    matched_list = _chain(plan.matchedActions(), "WHEN MATCHED")
    nbs_list = _chain(
        plan.notMatchedBySourceActions(), "WHEN NOT MATCHED BY SOURCE"
    )
    insert_list = []
    for a in _seq(plan.notMatchedActions()):
        cls = a.getClass().getSimpleName()
        c = _opt(a.condition())
        cond = None if c is None else c.sql()
        if cls == "InsertStarAction":
            values = "all"
        elif cls == "InsertAction":
            values = {
                _assign_key(g, {t_alias, t_name}): g.value().sql()
                for g in _seq(a.assignments())
            }
        else:
            raise ValueError(f"unsupported WHEN NOT MATCHED action {cls}")
        insert_list.append({"condition": cond, "values": values})

    pairs = _equi_keys(plan.mergeCondition(), t_alias, s_alias)
    # the executable merge joins USING-style (one shared key name per
    # equality); a differently-named source key is projected onto the
    # target's name, keeping the original column for clause expressions
    from pyspark.sql import functions as F

    for t_col, s_col in pairs:
        if s_col != t_col:
            if t_col in src.columns:
                raise ValueError(
                    f"MERGE ON maps {s_alias}.{s_col} to {t_alias}."
                    f"{t_col}, but the source already has a column "
                    f"{t_col!r} — rename one to disambiguate"
                )
            src = src.withColumn(t_col, F.col(s_col))
    on = [t for t, _ in pairs]
    return merge_into(
        spark,
        root,
        src,
        on,
        when_matched=matched_list or None,
        when_not_matched=insert_list or None,
        # the scalar default is insert="all"; no textual INSERT clause
        # means NO inserts
        when_not_matched_insert=None,
        when_not_matched_by_source=nbs_list or None,
        target_alias=t_alias,
        source_alias=s_alias,
        **opts,
    )


def _materialize_query(spark, jquery, tables: dict) -> DataFrame:
    """Analyze a parsed query sub-plan into a DataFrame via
    ``Dataset.ofRows``, with registered tables exposed as temp views
    for the analysis. Time-travel pins (``VERSION AS OF`` /
    ``TIMESTAMP AS OF``) are rewritten FIRST, so every query path that
    funnels here — ``query_sql``, INSERT/CTAS sources, MERGE subquery
    sources — can read a pinned version (``CREATE TABLE backup AS
    SELECT * FROM t VERSION AS OF 5`` is the table-clone verb; ``MERGE
    ... USING (SELECT ... FROM t TIMESTAMP AS OF ...) AS s`` merges
    from history). Only simple (un-dotted) names can back the
    query's relations: a temp view cannot shadow a catalog-qualified
    ``db.tbl`` reference. Pre-existing session temp views with
    colliding names are saved and restored — run_sql must not destroy
    the user's views."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        read_table,
    )

    pins: dict[str, DataFrame] = {}
    # Fast path (r10 second review pass): the pin walk now recurses
    # through every product arg AND every expression node (makeCopy +
    # SubqueryExpression support), which costs O(tree) py4j round trips
    # — wasted on the vast majority of statements that contain no pin.
    # Both rewrite triggers are visible in the UNRESOLVED tree string
    # (RelationTimeTravel nodes — including inside CTE bodies and
    # expression subqueries, which print as innerChildren — and the
    # table_changes TVF name), so one toString probe gates the walk.
    tree = jquery.toString()
    if "RelationTimeTravel" in tree or "table_changes" in tree.lower():
        jquery, _ = _replace_time_travel(spark, jquery, tables, pins)
    tables = {**tables, **pins}
    existing = {
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and not t.namespace
    }
    saved = {}
    registered = []
    try:
        for name, src in tables.items():
            if "." in name:
                continue
            if isinstance(src, str) and not os.path.exists(src):
                # a registered root that doesn't exist yet (e.g. the
                # TARGET of a later CTAS in a script) cannot back a
                # view; a query referencing it fails with a clear
                # table-not-found instead of a path error here
                continue
            if name in existing:
                saved[name] = spark.table(name)
            df = read_table(spark, src) if isinstance(src, str) else src
            df.createOrReplaceTempView(name)
            registered.append(name)
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, jquery
        )
        return DataFrame(jdf, spark)
    finally:
        for view in registered:
            if view in saved:
                saved[view].createOrReplaceTempView(view)
            else:
                spark.catalog.dropTempView(view)


def _replace_time_travel(spark, plan, tables: dict, pins: dict):
    """Recursive plan transform behind :func:`query_sql`: every
    ``RelationTimeTravel`` leaf (Spark's parse of ``t VERSION AS OF n``
    / ``t TIMESTAMP AS OF ts``, both bare and ``FOR``-prefixed) is
    resolved through the snapshot protocol's pinned read and replaced
    by a reference to a generated temp-view name, SubqueryAlias'd back
    to the original table name so qualified references (``t.col``)
    keep resolving. Returns ``(new_plan, changed)``; the pinned
    DataFrames land in ``pins``. Timestamps are evaluated by Catalyst
    itself (one driver-side row) into epoch seconds, so the session
    time zone is honored exactly as a write-side commit timestamp is.

    The walk covers plan CHILDREN, CTE definitions (joins, unions,
    subqueries in FROM, WITH bodies) AND — since r10 — expression-level
    subqueries (``WHERE x > (SELECT max(v) FROM t VERSION AS OF 1)``,
    ``IN (SELECT ...)``, ``EXISTS (SELECT ...)``): the generic tail
    rebuilds each node from its product args via TreeNode's own
    reflective ``makeCopy``, recursing into every ``SubqueryExpression``
    plan (``withNewPlan``) wherever it nests inside a condition or
    projection — closing the one documented hole in "pins anywhere a
    relation appears" (VERDICT r9 next-round #4)."""
    cls = plan.getClass().getSimpleName()
    if cls == "UnresolvedTableValuedFunction":
        # Delta-parity change-feed TVF: table_changes(table, v_from,
        # v_to, 'key1[,key2,...]') resolves through snapshot_changes
        # (this engine's diff is key-join-derived, so the key columns
        # are an explicit argument where Delta reads stored CDF files)
        name_parts = [str(x) for x in _seq(plan.name())]
        if [p.casefold() for p in name_parts] != ["table_changes"]:
            # any other TVF (range, explode, inline, ...) is Spark's to
            # resolve — intercepting only our own name keeps built-in
            # table functions working in every SQL path (r9 review #2)
            return plan, False
        from implementing_scds_in_hive_spark.sources.snapshot import (
            snapshot_changes,
        )

        args = plan.functionArgs()
        vals = []
        for i in range(args.size()):
            a = args.apply(i)
            if a.getClass().getSimpleName() != "Literal":
                raise ValueError(
                    f"table_changes arguments must be literals; got "
                    f"{a.sql()}"
                )
            vals.append(str(a.value()))
        if len(vals) != 4:
            raise ValueError(
                "table_changes takes (table_name, v_from, v_to, "
                "'key1[,key2,...]') — versions as integers or timestamp "
                "strings (Delta parity); the key columns drive the diff "
                "join"
            )
        keys = [k.strip() for k in vals[3].split(",") if k.strip()]
        if not keys:
            raise ValueError("table_changes needs at least one key column")
        root = _root_for(tables, vals[0])

        def _version_arg(label, raw):
            try:
                return int(raw)
            except ValueError:
                pass
            # Delta's table_changes accepts timestamp bounds: resolve
            # through the commit log like TIMESTAMP AS OF
            from implementing_scds_in_hive_spark.sources.snapshot import (
                version_at_timestamp,
            )

            return version_at_timestamp(
                root,
                _ts_string_to_epoch(
                    spark,
                    raw,
                    f"table_changes {label} must be an integer version "
                    f"or a timestamp string",
                ),
            )

        df = snapshot_changes(
            spark,
            root,
            _version_arg("v_from", vals[1]),
            _version_arg("v_to", vals[2]),
            keys,
        )
        gen = f"__tt_pin_{len(pins)}"
        pins[gen] = df
        return (
            spark._jsparkSession.sessionState()
            .sqlParser()
            .parsePlan(f"TABLE {gen}"),
            True,
        )
    if cls == "UnresolvedWith":
        # CTE bodies live in cteRelations (innerChildren), NOT in
        # children() — the generic walk below would never see a pin
        # inside a WITH definition (r9 self-review)
        jvm = spark._jvm
        to_seq = spark.sparkContext._jvm.PythonUtils.toSeq
        ctes = plan.cteRelations()
        new_ctes = []
        changed = False
        for i in range(ctes.size()):
            t = ctes.apply(i)
            nb, c = _replace_time_travel(spark, t._2(), tables, pins)
            changed = changed or c
            new_ctes.append(
                jvm.scala.Tuple3(t._1(), nb, t._3())
                if t.productArity() == 3
                else jvm.scala.Tuple2(t._1(), nb)
            )
        nc, c2 = _replace_time_travel(spark, plan.child(), tables, pins)
        if not (changed or c2):
            return plan, False
        return (
            plan.copy(nc, to_seq(new_ctes), plan.allowRecursion()),
            True,
        )
    if cls == "RelationTimeTravel":
        rel = plan.relation()
        if rel.getClass().getSimpleName() != "UnresolvedRelation":
            raise ValueError(
                f"time travel is supported on plain table references; "
                f"got {rel.getClass().getSimpleName()}"
            )
        from implementing_scds_in_hive_spark.sources.snapshot import (
            read_table,
        )

        parts = [str(x) for x in _seq(rel.multipartIdentifier())]
        root = _root_for(tables, ".".join(parts))
        v = _opt(plan.version())
        if v is not None:
            df = read_table(spark, root, version=int(str(v)))
        else:
            ts_sql = plan.timestamp().get().sql()
            micros = spark.sql(
                f"SELECT unix_micros(CAST(({ts_sql}) AS TIMESTAMP)) AS t"
            ).first()["t"]
            if micros is None:
                raise ValueError(
                    f"TIMESTAMP AS OF expression {ts_sql} evaluated to "
                    f"NULL"
                )
            df = read_table(spark, root, as_of_timestamp=micros / 1e6)
        gen = f"__tt_pin_{len(pins)}"
        pins[gen] = df
        snippet = spark._jsparkSession.sessionState().sqlParser().parsePlan(
            f"SELECT * FROM {gen} AS `{parts[-1]}`"
        )
        return snippet.children().apply(0), True
    # Generic tail: rebuild the node from its case-class product args
    # via TreeNode's own reflective makeCopy (what withNewChildren uses
    # internally, and the only py4j-reachable way to put TRANSFORMED
    # EXPRESSIONS back — transformExpressions needs a Scala
    # PartialFunction). Each arg that is a plan, an expression, or an
    # Option/Seq of either is transformed; everything else is carried
    # verbatim; an unchanged node is returned as-is.
    args = []
    changed = False
    it = plan.productIterator()
    while it.hasNext():
        na, c = _replace_tt_in_arg(spark, it.next(), tables, pins)
        args.append(na)
        changed = changed or c
    if not changed:
        return plan, False
    gateway = spark.sparkContext._gateway
    arr = gateway.new_array(spark._jvm.java.lang.Object, len(args))
    for i, a in enumerate(args):
        arr[i] = a
    return plan.makeCopy(arr), True


# per-gateway Class caches: {id(jvm): (weakref-to-jvm, {name: Class})}.
# The weakref validates identity — a GC'd JVMView's id can be reused by
# a new one (ADVICE r10) — while the per-id keying keeps two LIVE
# gateways from thrashing each other's cache (r11 review pass #3).
_JCLASS_CACHE: dict = {}


def _jinstance(spark, obj, class_name: str) -> bool:
    """``isinstance`` against a JVM class, with the resolved Class
    object cached per gateway — the makeCopy walk tests every product
    arg and every expression node, and an uncached Class.forName would
    multiply py4j round-trips per statement (r10 self-review).

    Cache validity is checked by IDENTITY against a weakref to the
    JVMView (ADVICE r10): keying on ``id(spark._jvm)`` alone could hand
    back Class handles bound to a dead gateway after a SparkContext
    restart — a GC'd JVMView's id can be reused by the new one. A
    weakref can never alias: if the old view was collected the ref
    reads None, and if it wasn't, ``is`` compares real objects. Caches
    are kept PER gateway id so two live sessions never thrash each
    other's entries."""
    jvm = spark._jvm
    slot = _JCLASS_CACHE.get(id(jvm))
    if slot is None or slot[0]() is not jvm:
        if len(_JCLASS_CACHE) >= 16:  # dead-gateway slots; tiny, reset
            _JCLASS_CACHE.clear()
        slot = (weakref.ref(jvm), {})
        _JCLASS_CACHE[id(jvm)] = slot
    cache = slot[1]
    cls = cache.get(class_name)
    if cls is None:
        cls = jvm.java.lang.Class.forName(class_name)
        cache[class_name] = cls
    return bool(cls.isInstance(obj))


def _replace_tt_in_arg(spark, a, tables: dict, pins: dict):
    """Transform ONE product arg of a plan node for the time-travel
    walk: plans recurse through :func:`_replace_time_travel`,
    expressions through :func:`_replace_tt_in_expr`, ``scala.Option`` /
    ``scala.collection.Seq`` wrappers are unwrapped, transformed and
    re-wrapped; any other value passes through untouched. Returns
    ``(new_arg, changed)``."""
    if a is None or isinstance(a, (str, int, float, bool, bytes)):
        return a, False
    jvm = spark._jvm
    if _jinstance(
        spark, a, "org.apache.spark.sql.catalyst.plans.logical.LogicalPlan"
    ):
        return _replace_time_travel(spark, a, tables, pins)
    if _jinstance(
        spark, a, "org.apache.spark.sql.catalyst.expressions.Expression"
    ):
        return _replace_tt_in_expr(spark, a, tables, pins)
    if _jinstance(spark, a, "scala.Option"):
        if a.isEmpty():
            return a, False
        inner, c = _replace_tt_in_arg(spark, a.get(), tables, pins)
        if not c:
            return a, False
        return jvm.scala.Option.apply(inner), True
    if _jinstance(spark, a, "scala.collection.Seq"):
        elems = []
        changed = False
        for i in range(a.size()):
            ne, c = _replace_tt_in_arg(spark, a.apply(i), tables, pins)
            elems.append(ne)
            changed = changed or c
        if not changed:
            return a, False
        return spark.sparkContext._jvm.PythonUtils.toSeq(elems), True
    return a, False


def _replace_tt_in_expr(spark, e, tables: dict, pins: dict):
    """Pin rewrite inside an EXPRESSION tree: every
    ``SubqueryExpression`` (ScalarSubquery, ListQuery behind IN,
    Exists) has its inner plan walked and — when a pin was rewritten —
    is rebuilt via ``withNewPlan``; expression children recurse the
    same way (a subquery can nest arbitrarily deep inside a
    condition). Returns ``(new_expr, changed)``."""
    changed = False
    if _jinstance(
        spark,
        e,
        "org.apache.spark.sql.catalyst.expressions.SubqueryExpression",
    ):
        np, c = _replace_time_travel(spark, e.plan(), tables, pins)
        if c:
            e = e.withNewPlan(np)
            changed = True
    ch = e.children()
    n = ch.size()
    if n:
        new_children = []
        c2 = False
        for i in range(n):
            ne, ci = _replace_tt_in_expr(spark, ch.apply(i), tables, pins)
            new_children.append(ne)
            c2 = c2 or ci
        if c2:
            to_seq = spark.sparkContext._jvm.PythonUtils.toSeq
            e = e.withNewChildren(to_seq(new_children))
            changed = True
    return e, changed


_WRITE_STMT_KINDS = frozenset(
    {
        "DeleteFromTable",
        "UpdateTable",
        "MergeIntoTable",
        "InsertIntoStatement",
        "AddColumns",
        "RenameColumn",
        "DropColumns",
        "CreateTableAsSelect",
    }
)


def _is_command_plan(spark, plan) -> bool:
    """True for any statement with side effects. ``Dataset.ofRows``
    EXECUTES Catalyst commands eagerly, so the read face must refuse
    every command plan, not just the verbs ``run_sql`` handles — a
    blacklist would let e.g. ``CREATE OR REPLACE TABLE``/``DROP
    TABLE``/``SET`` write real catalog state from the documented
    read-only path (r9 self-review). The ``Command`` trait covers all
    DDL/DML/config/cache statements Spark parses except
    ``InsertIntoStatement`` (checked by name)."""
    if plan.getClass().getSimpleName() == "InsertIntoStatement":
        return True
    cmd = spark._jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.Command"
    )
    return bool(cmd.isInstance(plan))


def query_sql(
    spark: SparkSession, statement: str, tables: dict
) -> DataFrame:
    """The READ half of the textual face (VERDICT r8 next-round #2):
    execute one SELECT (or VALUES/TABLE/CTE) statement against snapshot
    tables, including Delta-style time travel — ``SELECT ... FROM t
    VERSION AS OF n`` and ``TIMESTAMP AS OF <expr>`` (``FOR``-prefixed
    forms too), anywhere a relation can appear (joins, CTEs, derived
    tables; several pins of the SAME table in one query are fine).

    Same machinery as the write face: Spark's own parser, pins resolved
    through :func:`~...sources.snapshot.read_table` (version pin or
    ``version_at_timestamp``), and the plan materialized via
    ``Dataset.ofRows`` with registered tables exposed as temp views
    (pre-existing user views saved and restored). ``tables`` maps
    statement names to snapshot roots or DataFrames. Returns the result
    DataFrame — nothing is committed; write statements are refused
    (use :func:`run_sql`)."""
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(
        statement
    )
    if _is_command_plan(spark, plan):
        raise ValueError(
            f"query_sql executes read statements; got "
            f"{plan.getClass().getSimpleName()} — run write statements "
            f"through run_sql (other commands are not supported)"
        )
    return _materialize_query(spark, plan, tables)


def _run_ctas(spark, plan, tables: dict) -> dict:
    """``CREATE TABLE t [PARTITIONED BY (cols)] AS SELECT ...``:
    materialize the query and publish it as version 1 of a NEW snapshot
    table at the registered root. Refuses an existing table (ANSI
    CREATE; use INSERT OVERWRITE to replace content)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        write_snapshot,
    )

    name = ".".join(
        str(x) for x in _seq(plan.name().nameParts())
    )
    root = _root_for(tables, name)
    existing = latest_version(root)
    if existing is not None:
        if plan.ignoreIfExists():
            return {
                "op": "create_table",
                "version": existing,
                "skipped": True,
            }
        raise ValueError(
            f"table {name!r} already exists at {root} — CREATE TABLE "
            f"refuses to replace it (INSERT OVERWRITE replaces content; "
            f"RESTORE rolls back; IF NOT EXISTS no-ops)"
        )
    part_cols = []
    for i in range(plan.partitioning().size()):
        tr = plan.partitioning().apply(i)
        if tr.getClass().getSimpleName() != "IdentityTransform":
            raise ValueError(
                f"only PARTITIONED BY (column) is supported; got "
                f"{tr.describe()}"
            )
        # raw name parts via ref().fieldNames() (a Java array py4j
        # iterates), not describe() — which backtick-quotes non-simple
        # identifiers into names partitionBy can't resolve
        fparts = [str(x) for x in tr.ref().fieldNames()]
        if len(fparts) != 1:
            raise ValueError(
                f"PARTITIONED BY must name top-level columns; got "
                f"{'.'.join(fparts)}"
            )
        part_cols.append(fparts[0])
    # the not-yet-created target must not be registered as a view for
    # the query's analysis (reading it would fail — and a self-read
    # CTAS is meaningless anyway)
    q = _materialize_query(
        spark,
        plan.query(),
        {k: v for k, v in tables.items() if k != name},
    )
    new_v = write_snapshot(q, root, partition_by=part_cols or None)
    return {
        "op": "create_table",
        "version": new_v,
        "partition_by": part_cols,
    }


def _run_insert(spark, plan, tables: dict) -> dict:
    """INSERT INTO / INSERT OVERWRITE: materialize the parsed query via
    ``Dataset.ofRows`` (registered tables become temp views for the
    analysis, dropped after), align positionally to the target schema
    (SQL INSERT semantics; an explicit column list maps those columns,
    the rest insert NULL), commit append or overwrite."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
        read_table,
        write_snapshot,
    )

    t_name, _ = _name_of(plan.table())
    root = _root_for(tables, t_name)
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    m = load_manifest(root, v)
    schema = StructType.fromJson(json.loads(m["schema"]))
    t_cols = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}

    q = _materialize_query(spark, plan.query(), tables)

    user_cols = [str(c) for c in _seq(plan.userSpecifiedCols())]
    target = user_cols or t_cols
    bad = sorted(set(target) - set(t_cols))
    if bad:
        raise ValueError(f"INSERT column list references unknown {bad}")
    if len(set(target)) != len(target):
        dupes = sorted({c for c in target if target.count(c) > 1})
        raise ValueError(f"INSERT column list repeats columns {dupes}")
    if len(q.columns) != len(target):
        raise ValueError(
            f"INSERT query yields {len(q.columns)} columns; target list "
            f"has {len(target)}"
        )
    if len(set(q.columns)) != len(q.columns):
        # the positional alignment below maps by NAME (F.col), so a
        # query yielding duplicate output names (SELECT a, a FROM ...)
        # would fail analysis with an opaque ambiguity error — say why
        dupes = sorted({c for c in q.columns if q.columns.count(c) > 1})
        raise ValueError(
            f"INSERT query yields duplicate output column names {dupes}; "
            f"alias them uniquely (SELECT a, a AS a2 ...) — positional "
            f"mapping needs unambiguous names"
        )
    by_pos = {t: q.columns[i] for i, t in enumerate(target)}
    aligned = q.select(
        *[
            (
                F.col(f"`{by_pos[c]}`").cast(types[c])
                if c in by_pos
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in t_cols
        ]
    )
    mode = "overwrite" if plan.overwrite() else "append"
    stats = sorted({c for fs in m.get("stats", {}).values() for c in fs})
    new_v = write_snapshot(
        aligned,
        root,
        partition_by=list(m["partition_by"]) or None,
        mode=mode,
        expected_version=v,
        stats_cols=stats or None,
    )
    return {"op": "insert", "mode": mode, "version": new_v}


def _run_add_columns(spark, plan, tables: dict) -> dict:
    """ALTER TABLE ... ADD COLUMNS: a PURE METADATA commit
    (``snapshot.evolve_schema_commit``) — the new manifest adopts the
    parent's files verbatim with the union schema; pinned reads
    NULL-backfill every carried file (the r8 evolution contract). Not a
    byte of data is written."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        evolve_schema_commit,
    )

    parts = [str(x) for x in _seq(plan.table().multipartIdentifier())]
    root = _root_for(tables, ".".join(parts))
    added = []
    for c in _seq(plan.columnsToAdd()):
        name_parts = [str(x) for x in _seq(c.name())]
        if len(name_parts) != 1:
            raise ValueError(
                f"only top-level columns can be added; got "
                f"{'.'.join(name_parts)}"
            )
        added.append((name_parts[0], c.dataType().catalogString()))
    new_v = evolve_schema_commit(root, added)
    return {
        "op": "add_columns",
        "version": new_v,
        "added": [n for n, _ in added],
    }


def _describe_detail(root: str) -> dict:
    """``DESCRIBE DETAIL t`` (the Delta observability verb): one
    manifest read + a driver-side size walk — table shape, layout and
    merge-on-read debt in one dict, no data scanned."""
    import json as _json
    import os as _os

    from implementing_scds_in_hive_spark.sources.sinks import vector_debt
    from implementing_scds_in_hive_spark.sources.snapshot import (
        latest_version,
        load_manifest,
    )

    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    m = load_manifest(root, v)
    debt = vector_debt(root)
    sdoc = _json.loads(m["schema"])
    n_ext = sum(1 for f in m["files"] if _os.path.isabs(f))
    return {
        "op": "describe_detail",
        "location": root,
        "version": v,
        "committed_at": m.get("committed_at"),
        "num_files": len(m["files"]),
        # clone-awareness (r11): ABSOLUTE entries reference another
        # table's files (SHALLOW CLONE); local maintenance verbs that
        # rewrite data (compact_deletes, OPTIMIZE) LOCALIZE whatever
        # they touch — these metrics surface how much of the table
        # still lives externally before a user pays that copy
        "external_files": n_ext,
        "external_fraction": n_ext / max(1, len(m["files"])),
        "size_bytes": sum(
            _os.path.getsize(_os.path.join(root, f)) for f in m["files"]
        ),
        "partition_by": list(m["partition_by"]),
        "columns": [f["name"] for f in sdoc["fields"]],
        "column_mapping": dict(m.get("column_mapping") or {}),
        "retired_physical": list(m.get("retired_physical") or []),
        "stats_columns": sorted(
            {c for per in (m.get("stats") or {}).values() for c in per}
        ),
        "vectored_files": debt["vectored_files"],
        "vector_files": debt["vector_files"],
        "vector_bytes": debt["vector_bytes"],
        "app_meta": dict(m.get("app_meta") or {}),
    }


def _run_rename_column(spark, plan, tables: dict) -> dict:
    """ALTER TABLE ... RENAME COLUMN a TO b: a PURE METADATA commit
    (``snapshot.rename_column_commit``, Delta/Iceberg name-mode column
    mapping) — carried files keep serving the unchanged PHYSICAL name;
    pinned reads at pre-rename versions still see the old name."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        rename_column_commit,
    )

    parts = [str(x) for x in _seq(plan.table().multipartIdentifier())]
    root = _root_for(tables, ".".join(parts))
    old_parts = [str(x) for x in _seq(plan.column().name())]
    if len(old_parts) != 1:
        raise ValueError(
            f"only top-level columns can be renamed; got "
            f"{'.'.join(old_parts)}"
        )
    new = str(plan.newName())
    new_v = rename_column_commit(root, old_parts[0], new)
    return {
        "op": "rename_column",
        "version": new_v,
        "renamed": {old_parts[0]: new},
    }


def _run_drop_columns(spark, plan, tables: dict) -> dict:
    """ALTER TABLE ... DROP COLUMN(S): ONE PURE METADATA commit
    (``snapshot.drop_column_commit``) — the physical names retire so a
    later ADD of the same logical name can never resurrect the dropped
    bytes. A multi-column drop is ATOMIC: every name validates against
    the same manifest and either all drop or none (a per-column commit
    loop would leave the table half-altered when a later name is
    refused — r10 self-review). ``IF EXISTS`` skips missing columns
    like Spark does (resolved up front, before any commit)."""
    from implementing_scds_in_hive_spark.sources.snapshot import (
        drop_column_commit,
        latest_version,
        load_manifest,
    )

    parts = [str(x) for x in _seq(plan.table().multipartIdentifier())]
    root = _root_for(tables, ".".join(parts))
    if_exists = bool(plan.ifExists())
    names = []
    for c in _seq(plan.columnsToDrop()):
        name_parts = [str(x) for x in _seq(c.name())]
        if len(name_parts) != 1:
            raise ValueError(
                f"only top-level columns can be dropped; got "
                f"{'.'.join(name_parts)}"
            )
        names.append(name_parts[0])
    skipped = []
    if if_exists:
        v = latest_version(root)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
        import json as _json

        have = {
            f["name"].casefold()
            for f in _json.loads(load_manifest(root, v)["schema"])["fields"]
        }
        skipped = [n for n in names if n.casefold() not in have]
        names = [n for n in names if n.casefold() in have]
    new_v = drop_column_commit(root, names) if names else None
    return {
        "op": "drop_columns",
        "version": new_v,
        "dropped": names,
        "skipped": skipped,
    }


def run_sql(
    spark: SparkSession,
    statement: str,
    tables: dict,
    **opts,
) -> dict:
    """Execute one DML / maintenance SQL statement against snapshot
    tables. ``tables`` maps statement table names to snapshot roots
    (MERGE sources may be DataFrames). ``**opts`` pass through to the
    underlying verb (``tier=``, ``vector_format=``, ``prune=``,
    ``cow_max_touched_fraction=``, ...).

    Statements: ``DELETE FROM t [WHERE ...]``, ``UPDATE t SET ...
    [WHERE ...]``, ``MERGE INTO t USING s | (SELECT ...) AS s ON ...
    WHEN [NOT] MATCHED [AND cond] ...`` (conditional INSERT and
    subquery sources included),
    ``INSERT INTO/OVERWRITE t [(cols)] SELECT ...|VALUES ...``,
    ``CREATE TABLE t [PARTITIONED BY (...)] AS SELECT ...`` (new
    snapshot root), ``ALTER TABLE t ADD COLUMNS (...)`` (zero-rewrite
    schema evolution), ``RESTORE TABLE t TO VERSION AS OF n |
    TIMESTAMP AS OF 'ts'`` (carry-by-reference), ``VACUUM t [RETAIN n
    HOURS] [DRY RUN]`` (DRY RUN: read-only preview of what a real pass
    would delete/tombstone), ``OPTIMIZE t [APPLY (PURGE)]``,
    ``DESCRIBE HISTORY t``, ``DESCRIBE DETAIL t``, ``CREATE TABLE d
    SHALLOW CLONE s [pin]`` (zero-copy data clone) and ``CREATE TABLE
    d LIKE s [pin]`` (empty table, source schema — the reference's
    literal step 1). Returns the verb's report dict."""
    bare = _strip_leading_comments(statement)
    m = _RESTORE_RE.match(bare)
    if m:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            version_at_timestamp,
        )

        root = _root_for(tables, m.group("t"))
        if m.group("v") is not None:
            target = int(m.group("v"))
        else:
            target = version_at_timestamp(
                root,
                _ts_string_to_epoch(
                    spark, m.group("ts"), "RESTORE TIMESTAMP AS OF"
                ),
            )
        new_v = restore_version(spark, root, target, **opts)
        return {"op": "restore", "version": new_v}
    m = _VACUUM_RE.match(bare)
    if m:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            vacuum,
        )

        root = _root_for(tables, m.group("t"))
        kw = dict(opts)
        if m.group("h") is not None:
            kw.setdefault("grace_seconds", float(m.group("h")) * 3600.0)
        if m.group("dry"):
            kw["dry_run"] = True
        return {"op": "vacuum", **vacuum(root, **kw)}
    m = _HISTORY_RE.match(bare)
    if m:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            table_history,
        )

        root = _root_for(tables, m.group("t"))
        return {"op": "describe_history", "history": table_history(root)}
    m = _DETAIL_RE.match(bare)
    if m:
        return _describe_detail(_root_for(tables, m.group("t")))
    m = _CLONE_RE.match(bare)
    if m:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            clone_table,
        )

        kw: dict = dict(opts)  # clone_table rejects unknown opts loudly
        # the SQL face always has a session, so a source whose vector
        # debt exceeds the driver cap transparently takes the
        # DISTRIBUTED rewrite path instead of refusing
        kw.setdefault("spark", spark)
        if m.group("v"):
            kw["version"] = int(m.group("v"))
        if m.group("ts"):
            kw["as_of_timestamp"] = _ts_string_to_epoch(
                spark, m.group("ts"), "SHALLOW CLONE TIMESTAMP AS OF"
            )
        v = clone_table(
            _root_for(tables, m.group("s")),
            _root_for(tables, m.group("d")),
            **kw,
        )
        return {
            "op": "shallow_clone",
            "source": m.group("s"),
            "target": m.group("d"),
            "version": v,
        }
    m = _LIKE_RE.match(bare)
    if m:
        from implementing_scds_in_hive_spark.sources.snapshot import (
            create_table_like,
        )

        kw = dict(opts)
        if m.group("v"):
            kw["version"] = int(m.group("v"))
        if m.group("ts"):
            kw["as_of_timestamp"] = _ts_string_to_epoch(
                spark, m.group("ts"), "CREATE TABLE LIKE TIMESTAMP AS OF"
            )
        v = create_table_like(
            _root_for(tables, m.group("s")),
            _root_for(tables, m.group("d")),
            **kw,
        )
        return {
            "op": "create_table_like",
            "source": m.group("s"),
            "target": m.group("d"),
            "version": v,
        }
    m = _OPTIMIZE_RE.match(bare)
    if m:
        root = _root_for(tables, m.group("t"))
        if m.group("purge"):
            from implementing_scds_in_hive_spark.sources.sinks import (
                compact_deletes,
            )

            return {"op": "optimize", **compact_deletes(spark, root, **opts)}
        from implementing_scds_in_hive_spark.sources.sinks import (
            compact_incremental,
        )

        return {"op": "optimize", **compact_incremental(spark, root, **opts)}

    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(
        statement
    )
    cls = plan.getClass().getSimpleName()
    if cls == "DeleteFromTable":
        name, alias = _name_of(plan.table())
        return delete_where(
            spark,
            _root_for(tables, name),
            plan.condition().sql(),
            scope_alias=alias,
            **opts,
        )
    if cls == "UpdateTable":
        name, alias = _name_of(plan.table())
        sets = {
            _assign_key(a, {alias, name}): a.value().sql()
            for a in _seq(plan.assignments())
        }
        cond = _opt(plan.condition())
        return update_where(
            spark,
            _root_for(tables, name),
            sets,
            "true" if cond is None else cond.sql(),
            scope_alias=alias,
            **opts,
        )
    if cls == "MergeIntoTable":
        return _run_merge(spark, plan, tables, opts)
    if cls == "InsertIntoStatement":
        if opts:
            raise ValueError(f"INSERT takes no options; got {sorted(opts)}")
        return _run_insert(spark, plan, tables)
    if cls == "AddColumns":
        if opts:
            raise ValueError(f"ALTER takes no options; got {sorted(opts)}")
        return _run_add_columns(spark, plan, tables)
    if cls == "RenameColumn":
        if opts:
            raise ValueError(f"ALTER takes no options; got {sorted(opts)}")
        return _run_rename_column(spark, plan, tables)
    if cls == "DropColumns":
        if opts:
            raise ValueError(f"ALTER takes no options; got {sorted(opts)}")
        return _run_drop_columns(spark, plan, tables)
    if cls == "CreateTableAsSelect":
        if opts:
            raise ValueError(f"CREATE takes no options; got {sorted(opts)}")
        return _run_ctas(spark, plan, tables)
    raise ValueError(
        f"unsupported statement kind {cls} — run_sql executes DML and "
        f"maintenance verbs; run read queries through the DataFrame/"
        f"spark.sql face"
    )


def split_sql_statements(script: str) -> list[str]:
    """Split a multi-statement SQL script on the ``;`` separators that
    are OUTSIDE string literals ('...' with backslash escapes, "..."),
    backticked identifiers, line comments (``-- ...``) and block
    comments (``/* ... */``, NESTED per SPARK-28880: ``/* a /* b */ c
    */`` is one comment, so the scanner tracks depth — a flat scanner
    would leave comment state at the first ``*/`` and split on a ``;``
    inside the outer comment's tail) — the places a naive
    ``split(';')`` corrupts. Comments stay attached to their statement
    (Spark's parser handles them); fragments containing only
    comments/whitespace are dropped. Pure driver-side text scan,
    O(len(script))."""
    stmts: list[str] = []
    buf: list[str] = []
    has_code = False
    state: str | None = None
    depth = 0
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if state in ("'", '"'):
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(nxt)
                i += 2
                continue
            if ch == state:
                state = None
            i += 1
            continue
        if state == "`":
            buf.append(ch)
            if ch == "`":
                state = None
            i += 1
            continue
        if state == "--":
            buf.append(ch)
            if ch == "\n":
                state = None
            i += 1
            continue
        if state == "/*":
            if ch == "/" and nxt == "*":
                buf.append(ch)
                buf.append(nxt)
                i += 2
                depth += 1
                continue
            buf.append(ch)
            if ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 2
                depth -= 1
                if depth == 0:
                    state = None
                continue
            i += 1
            continue
        if ch == ";":
            s = "".join(buf).strip()
            if s and has_code:
                stmts.append(s)
            buf = []
            has_code = False
            i += 1
            continue
        if ch in ("'", '"', "`"):
            state = ch
            has_code = True
        elif ch == "-" and nxt == "-":
            state = "--"
        elif ch == "/" and nxt == "*":
            state = "/*"
            depth = 1
            buf.append(ch)
            buf.append(nxt)
            i += 2
            continue
        elif not ch.isspace():
            has_code = True
        buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s and has_code:
        stmts.append(s)
    return stmts


def run_sql_script(spark: SparkSession, script: str, tables: dict) -> list:
    """Execute a multi-statement SQL script against snapshot tables —
    the reference's own modality (SCD_script.txt is an 8-statement
    script) generalized to this engine's full surface: each statement
    is routed to :func:`run_sql` (DML / DDL / maintenance, returning
    its report dict) or :func:`query_sql` (reads, returning the result
    DataFrame), in order, and the per-statement results come back as a
    list. Statements run with default options (``tier="auto"`` etc.);
    use :func:`run_sql` directly when a statement needs explicit
    options. A failing statement raises with everything before it
    committed — statement-level atomicity, exactly the semantics of
    running the script through any SQL CLI (the manifest protocol has
    no cross-statement transactions, like Delta)."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    results = []
    for stmt in split_sql_statements(script):
        bare = _strip_leading_comments(stmt)
        if any(
            rx.match(bare)
            for rx in (_RESTORE_RE, _VACUUM_RE, _HISTORY_RE, _OPTIMIZE_RE,
                       _DETAIL_RE, _CLONE_RE, _LIKE_RE)
        ):
            results.append(run_sql(spark, stmt, tables))
            continue
        cls = parser.parsePlan(stmt).getClass().getSimpleName()
        if cls in _WRITE_STMT_KINDS:
            results.append(run_sql(spark, stmt, tables))
        else:
            # query_sql refuses non-read commands loudly
            results.append(query_sql(spark, stmt, tables))
    return results
