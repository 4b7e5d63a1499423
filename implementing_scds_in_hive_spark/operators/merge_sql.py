"""Delta/Iceberg ``MERGE INTO`` generation for the SCD2 merge.

The engine's DataFrame plan (operators/scd.py) is the portable core; on
a lake house with a table format that supports row-level MERGE (Delta,
Iceberg — the deployment BASELINE.json names), the same semantics run as
ONE atomic MERGE statement against the staged-updates view generated
here, rewriting only the touched files instead of the whole table. This
module emits that SQL from an ``SCDConfig`` so the two faces cannot
drift: the change predicate, Type-1/Type-2 column split, and metadata
columns all derive from the same config object.

Pattern (the canonical Delta SCD2 recipe): a staging row whose key
matches an active target row WITH a Type-2 change must both close the
old row (UPDATE) and insert a new version (INSERT) — one source row,
two actions. MERGE fires at most one action per source row, so the
staged view duplicates changed rows: one copy carries the business key
as ``__merge_key`` (drives the UPDATE), the duplicate carries NULL
(never matches -> drives the INSERT). Brand-new keys arrive once with
their key and fall through to the INSERT clause. The inserted
``scd_version`` is precomputed in the view (MERGE actions cannot hold
subqueries in Delta), as max-existing-version + 1, i.e. 1 for brand-new
keys.

Not executable in this container (no Delta/Iceberg runtime; OSS Spark's
MERGE needs a v2 table with row-level operations) — structurally tested,
and semantically anchored to the DataFrame plan through the shared
config. Cite: /root/reference/SCD_script.txt:8-155 (the eight-statement
pipeline this single statement replaces).
"""

from __future__ import annotations

from implementing_scds_in_hive_spark.operators.scd import SCDConfig


def _change_predicate(cfg: SCDConfig, t: str = "t", s: str = "s") -> str:
    return " OR ".join(f"NOT ({t}.{c} <=> {s}.{c})" for c in cfg.type2_cols)


def staged_updates_sql(cfg: SCDConfig, target: str, staging: str) -> str:
    """The pre-MERGE view: every staging row (key as ``__merge_key``)
    plus NULL-key duplicates of rows that change an active target row
    (the INSERT drivers), each carrying the precomputed next version."""
    change = _change_predicate(cfg)
    cols = ", ".join(f"s.{c}" for c in cfg.business_cols)
    next_version = f"COALESCE(m.__maxv, 0) + 1 AS __new_version"
    max_versions = (
        f"SELECT {cfg.key}, MAX({cfg.version_col}) AS __maxv "
        f"FROM {target} GROUP BY {cfg.key}"
    )
    return (
        f"WITH __max_v AS ({max_versions})\n"
        f"SELECT s.{cfg.key} AS __merge_key, {cols}, {next_version}\n"
        f"FROM {staging} s LEFT JOIN __max_v m ON m.{cfg.key} = s.{cfg.key}\n"
        f"UNION ALL\n"
        f"SELECT NULL AS __merge_key, {cols}, {next_version}\n"
        f"FROM {staging} s LEFT JOIN __max_v m ON m.{cfg.key} = s.{cfg.key}\n"
        f"JOIN {target} t ON t.{cfg.key} = s.{cfg.key}\n"
        f"WHERE t.{cfg.active_col} AND ({change})"
    )


def merge_into_sql(
    cfg: SCDConfig,
    target: str,
    staged_view: str,
    *,
    as_of_expr: str = "current_timestamp()",
) -> str:
    """The single MERGE statement: close-out changed active rows (with
    Type-1 rewrite), Type-1-rewrite every other matched row — including
    inactive history, reference step 3 — and insert new versions and
    brand-new keys. Surrogate re-key stays a separate step, as in the
    reference's step 8."""
    change = _change_predicate(cfg)
    t1_set = ", ".join(f"t.{c} = s.{c}" for c in cfg.type1_cols)
    ins_cols = ", ".join(cfg.business_cols)
    ins_vals = ", ".join(f"s.{c}" for c in cfg.business_cols)
    closeout_set = (
        f"t.{cfg.end_col} = {as_of_expr}, t.{cfg.active_col} = false"
        + (f", {t1_set}" if t1_set else "")
    )
    return (
        f"MERGE INTO {target} t\n"
        f"USING {staged_view} s\n"
        f"ON t.{cfg.key} = s.__merge_key\n"
        f"WHEN MATCHED AND t.{cfg.active_col} AND ({change}) THEN\n"
        f"  UPDATE SET {closeout_set}\n"
        + (f"WHEN MATCHED THEN\n  UPDATE SET {t1_set}\n" if t1_set else "")
        + f"WHEN NOT MATCHED THEN\n"
        f"  INSERT ({ins_cols}, {cfg.version_col}, {cfg.start_col}, "
        f"{cfg.end_col}, {cfg.active_col})\n"
        f"  VALUES ({ins_vals}, s.__new_version, {as_of_expr}, "
        f"TIMESTAMP '{cfg.end_of_time}', true)"
    )


def scd2_merge_statements(
    cfg: SCDConfig,
    target: str = "dim",
    staging: str = "staging_batch",
    *,
    as_of_expr: str = "current_timestamp()",
) -> list[str]:
    """The full lake-deployment script: staged view + MERGE. Run inside
    one Delta/Iceberg transaction; follow with the re-key step
    (assign_surrogate_keys) if dense surrogate keys are required."""
    view = staged_updates_sql(cfg, target, staging)
    return [
        f"CREATE OR REPLACE TEMP VIEW __scd_staged AS\n{view}",
        merge_into_sql(cfg, target, "__scd_staged", as_of_expr=as_of_expr),
    ]
