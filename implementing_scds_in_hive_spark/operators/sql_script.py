"""The reference's SCD script as runnable multi-statement Spark SQL.

A user of the reference drives the whole pipeline with a HiveQL script
(/root/reference/SCD_script.txt:3-155): CREATE TABLE, six INSERT INTO
branch statements, a ROW_NUMBER re-key, and an INSERT OVERWRITE publish.
This module generates and executes that exact statement shape against
Spark's SQL engine, so the reference's workflow runs unchanged in form —
every statement type it uses (CREATE TABLE, CREATE TABLE LIKE-equivalent,
INSERT INTO SELECT, INSERT OVERWRITE, DROP TABLE) goes through
``spark.sql``.

This is the tutorial-parity path, kept deliberately close to the
reference's 8-statement structure: production is scanned once per branch
(5x) and staging once per branch (6x), exactly like the reference's
separate MapReduce jobs. The production engine path is
``operators.scd.scd2_merge`` — ONE pass over each input — and
``tests/test_sql_script.py`` proves the two produce identical rows.
Differences from the reference's literal SQL are the engine's documented
semantic fixes, applied here too so the two paths agree:

* null-safe ``<=>`` change detection on ALL Type-2 columns
  (SCD_script.txt:78-80 guards only one column);
* one deterministic ``as_of`` instant instead of per-statement
  ``current_timestamp()`` drift (README.md:316-320 shows the drift);
* deterministic re-key tie-break ``(start, key, version)``
  (the reference's two docs disagree on tie order,
  README.md:306-312 vs "Hive 2.md":292-298);
* NULL ``scd_active`` treated as active: the engine's ``F.when`` chain
  (scd.py prod_branches) skips the ``~active`` branch when active is
  NULL and falls through to the steps-4/5/6 logic, whereas a bare
  ``WHERE NOT p.scd_active`` / ``WHERE p.scd_active AND ...`` pair
  would drop the row entirely under SQL three-valued logic — so every
  active-column predicate here wraps in ``COALESCE(p.active, TRUE)``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from .scd import SCDConfig


def _change_predicate(cfg: SCDConfig, p: str = "p", s: str = "s") -> str:
    """NOT (p.c <=> s.c) OR ... over every Type-2 column."""
    return " OR ".join(
        f"NOT ({p}.{c} <=> {s}.{c})" for c in cfg.type2_cols
    )


def scd2_script_statements(
    cfg: SCDConfig,
    schema_ddl: list[tuple[str, str]],
    staging_cols: set[str],
    as_of: str,
    *,
    prod_view: str,
    staging_view: str,
    work_table: str,
    target_table: str,
) -> list[str]:
    """The reference's statement sequence (SCD_script.txt:3-155) over
    Spark SQL tables. ``schema_ddl`` is the output table's ordered
    ``(name, sql_type)`` list (production's schema — CREATE TABLE LIKE
    semantics); ``staging_cols`` says which business columns staging
    carries (absent ones stay NULL on fresh rows / carried on rewrites,
    matching the engine).
    """
    cols = [c for c, _ in schema_ddl]
    types = dict(schema_ddl)
    ddl = ", ".join(f"{c} {t}" for c, t in schema_ddl)
    changed = _change_predicate(cfg)
    # Three-valued-logic guard: NULL scd_active must route to the
    # active branches (steps 4-6), exactly like the engine's F.when
    # fall-through — a bare `p.scd_active` predicate would match no
    # branch and silently drop the row.
    active = f"COALESCE(p.{cfg.active_col}, TRUE)"
    as_of_lit = f"TIMESTAMP '{as_of}'"
    eot_lit = f"TIMESTAMP '{cfg.end_of_time}'"
    t1_rewritten = {c for c in cfg.type1_cols if c in staging_cols}

    def plist(overrides: dict[str, str]) -> str:
        return ",\n           ".join(
            overrides.get(c, f"p.{c}") for c in cols
        )

    carried = plist({})
    # Type-1 rewrite: staging's Type-1 values, production's everything else
    # (reference steps 3-4, SCD_script.txt:13-60).
    t1 = {c: f"s.{c}" for c in t1_rewritten}
    type1_rw = plist(t1)
    closeout = plist({**t1, cfg.end_col: as_of_lit, cfg.active_col: "FALSE"})

    def from_staging(version_expr: str) -> str:
        vals = {
            c: (f"s.{c}" if c in staging_cols else f"CAST(NULL AS {types[c]})")
            for c in cols
        }
        vals[cfg.surrogate_col] = f"CAST(NULL AS {types[cfg.surrogate_col]})"
        vals[cfg.version_col] = version_expr
        vals[cfg.start_col] = as_of_lit
        vals[cfg.end_col] = eot_lit
        vals[cfg.active_col] = "TRUE"
        return ",\n           ".join(vals[c] for c in cols)

    k = cfg.key
    order_by = f"{cfg.start_col}, {k}, {cfg.version_col}"
    rekeyed = ", ".join(
        f"CAST(ROW_NUMBER() OVER (ORDER BY {order_by}) AS "
        f"{types[cfg.surrogate_col]}) AS {cfg.surrogate_col}"
        if c == cfg.surrogate_col
        else c
        for c in cols
    )

    return [
        # Step 1 — the work table (SCD_script.txt:3-7 creates dim_user_new
        # LIKE dim_user; the DDL below IS production's schema).
        f"CREATE TABLE {work_table} ({ddl}) USING PARQUET",
        # Step 2 — keys absent from staging, carried verbatim
        # (SCD_script.txt:8-12: LEFT JOIN + IS NULL probe).
        f"""INSERT INTO {work_table}
    SELECT {carried}
    FROM {prod_view} p LEFT JOIN {staging_view} s ON p.{k} = s.{k}
    WHERE s.{k} IS NULL""",
        # Step 3 — inactive history rows of staged keys: Type-1 rewrite
        # (SCD_script.txt:13-35).
        f"""INSERT INTO {work_table}
    SELECT {type1_rw}
    FROM {prod_view} p JOIN {staging_view} s ON p.{k} = s.{k}
    WHERE NOT {active}""",
        # Step 4 — active rows with no Type-2 change: Type-1 rewrite
        # (SCD_script.txt:36-60).
        f"""INSERT INTO {work_table}
    SELECT {type1_rw}
    FROM {prod_view} p JOIN {staging_view} s ON p.{k} = s.{k}
    WHERE {active} AND NOT ({changed})""",
        # Step 5 — active rows WITH a Type-2 change: close out
        # (SCD_script.txt:61-86).
        f"""INSERT INTO {work_table}
    SELECT {closeout}
    FROM {prod_view} p JOIN {staging_view} s ON p.{k} = s.{k}
    WHERE {active} AND ({changed})""",
        # Step 6 — the changed keys' NEW active version
        # (SCD_script.txt:87-120).
        f"""INSERT INTO {work_table}
    SELECT {from_staging(f"p.{cfg.version_col} + 1")}
    FROM {prod_view} p JOIN {staging_view} s ON p.{k} = s.{k}
    WHERE {active} AND ({changed})""",
        # Step 7 — brand-new keys (SCD_script.txt:121-137: LEFT JOIN the
        # other way + IS NULL probe).
        f"""INSERT INTO {work_table}
    SELECT {from_staging("1")}
    FROM {staging_view} s LEFT JOIN {prod_view} p ON s.{k} = p.{k}
    WHERE p.{k} IS NULL""",
        # Step 8 — wholesale surrogate re-key + atomic publish
        # (SCD_script.txt:141-155: INSERT OVERWRITE ... ROW_NUMBER()).
        f"CREATE TABLE {target_table} ({ddl}) USING PARQUET",
        f"""INSERT OVERWRITE {target_table}
    SELECT {rekeyed}
    FROM {work_table}""",
    ]


def run_scd2_script(
    spark: SparkSession,
    prod: DataFrame,
    staging: DataFrame,
    cfg: SCDConfig,
    as_of: str,
    *,
    name_prefix: str = "scd_script",
) -> DataFrame:
    """Execute the reference-shaped statement sequence and return the
    published table. Tables are namespaced by ``name_prefix`` so callers
    can run concurrently; call :func:`cleanup_script_tables` (or DROP
    TABLE yourself — the reference's own S4 statement) when done with the
    returned DataFrame.

    The global ROW_NUMBER in step 8 makes this a single-partition sort at
    the tail, same as the reference's final reducer — tutorial parity,
    not the 100 TB path (that is ``scd2_merge`` + ``two_pass`` keys).

    Table names carry a per-run suffix so CHAINED runs are safe: the
    returned DataFrame lazily reads this run's ``_dim`` table, and a
    next merge that fed it back as production must not drop/recreate
    the table underneath it (the reference's own self-overwrite trap,
    SCD_script.txt materializes dim_user_new for the same reason —
    caught by ``test_script_equals_engine_on_random_batches``).
    ``cleanup_script_tables`` drops every run of the prefix at once.
    """
    run_id = uuid.uuid4().hex[:8]
    prod_view = f"{name_prefix}_prod"
    staging_view = f"{name_prefix}_staging"
    work_table = f"{name_prefix}_work_{run_id}"
    target_table = f"{name_prefix}_dim_{run_id}"
    prod.createOrReplaceTempView(prod_view)
    staging.createOrReplaceTempView(staging_view)

    schema_ddl = [(f.name, f.dataType.simpleString()) for f in prod.schema.fields]
    for stmt in scd2_script_statements(
        cfg,
        schema_ddl,
        set(staging.columns),
        as_of,
        prod_view=prod_view,
        staging_view=staging_view,
        work_table=work_table,
        target_table=target_table,
    ):
        spark.sql(stmt)
    return spark.table(target_table)


def cleanup_script_tables(spark: SparkSession, name_prefix: str = "scd_script") -> None:
    """The reference's own teardown statement type (S4): drops EVERY
    run's work/dim table under ``name_prefix`` (run-suffixed — see
    :func:`run_scd2_script`), plus the two input temp views — otherwise
    they leak into the shared session catalog across runs. Call once
    the returned DataFrames are no longer needed; they read the _dim
    tables lazily."""
    for t in spark.catalog.listTables():
        # temp views report tableType "TEMPORARY", not "VIEW" — filter on
        # isTemporary too so a prefix-matching temp view never gets DROP TABLE
        if not t.isTemporary and t.tableType != "VIEW" and (
            t.name.startswith(f"{name_prefix}_work") or t.name.startswith(f"{name_prefix}_dim")
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    for v in (f"{name_prefix}_prod", f"{name_prefix}_staging"):
        spark.catalog.dropTempView(v)
