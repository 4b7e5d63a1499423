"""Validation of the Delta/Iceberg MERGE generator.

No MERGE-capable table format exists in this container, so the MERGE's
row-level semantics are emulated in DuckDB (UPDATE branches as a
projection over target ⟕ staged, INSERT branch as the staged rows whose
``__merge_key`` matches nothing) and the result is compared against the
DataFrame plan (``scd2_merge``) on the reference's golden dim_user
example — the two faces of the engine must produce the same table.
"""

from datetime import datetime

import duckdb
import pytest

from implementing_scds_in_hive_spark.operators.merge_sql import (
    merge_into_sql,
    scd2_merge_statements,
    staged_updates_sql,
)
from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge
from tests.test_scd_golden import AS_OF, CFG, EOT, PROD_SCHEMA, STG_SCHEMA, T0

AS_OF_SQL = "TIMESTAMP '2024-05-01 12:00:00'"


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE dim (
             dim_user_id INT, login VARCHAR, premium_user BOOLEAN,
             address VARCHAR, phone VARCHAR, name VARCHAR, surname VARCHAR,
             year_of_birth INT, scd_version INT, scd_start_date TIMESTAMP,
             scd_end_date TIMESTAMP, scd_active BOOLEAN)"""
    )
    con.execute(
        "INSERT INTO dim VALUES "
        "(1,'user1',true,'address1','123456789','John','Doe',1980,1,?,?,true),"
        "(2,'user2',false,'address2',NULL,'Alice','Smith',1990,1,?,?,true)",
        [T0, EOT, T0, EOT],
    )
    con.execute(
        """CREATE TABLE staging_batch (
             login VARCHAR, name VARCHAR, surname VARCHAR, year_of_birth INT,
             premium_user BOOLEAN, address VARCHAR, phone VARCHAR)"""
    )
    con.execute(
        "INSERT INTO staging_batch VALUES "
        "('user1','John','Doe',1985,true,'address1','987654321'),"
        "('user2','Alice','Smith',1990,true,'address2',NULL),"
        "('user3','Emma','Johnson',1985,true,'address3','987654321')"
    )
    yield con
    con.close()


def _emulate_merge(con, cfg: SCDConfig):
    """Apply the generated statements' semantics in DuckDB. The staged
    view SQL runs verbatim; the MERGE is emulated clause-for-clause:
    matched rows take the first satisfied WHEN's UPDATE, unmatched
    staged rows INSERT."""
    # dialect translation only: Spark's null-safe `a <=> b` is DuckDB's
    # `a IS NOT DISTINCT FROM b`
    staged = staged_updates_sql(cfg, "dim", "staging_batch").replace(
        "<=>", "IS NOT DISTINCT FROM"
    )
    con.execute("CREATE OR REPLACE TEMP VIEW __scd_staged AS\n" + staged)
    change = " OR ".join(
        f"NOT (t.{c} IS NOT DISTINCT FROM s.{c})" for c in cfg.type2_cols
    )
    t1 = {c: f"s.{c}" for c in cfg.type1_cols}
    # UPDATE side: every target row, joined to its (unique) staged match
    con.execute(
        f"""
        CREATE OR REPLACE TEMP VIEW __after_updates AS
        SELECT t.dim_user_id, t.login,
               t.premium_user, t.address, t.phone,
               CASE WHEN s.__merge_key IS NOT NULL THEN {t1['name']} ELSE t.name END AS name,
               CASE WHEN s.__merge_key IS NOT NULL THEN {t1['surname']} ELSE t.surname END AS surname,
               CASE WHEN s.__merge_key IS NOT NULL THEN {t1['year_of_birth']} ELSE t.year_of_birth END AS year_of_birth,
               t.scd_version,
               t.scd_start_date,
               CASE WHEN s.__merge_key IS NOT NULL AND t.scd_active AND ({change})
                    THEN {AS_OF_SQL} ELSE t.scd_end_date END AS scd_end_date,
               CASE WHEN s.__merge_key IS NOT NULL AND t.scd_active AND ({change})
                    THEN false ELSE t.scd_active END AS scd_active
        FROM dim t LEFT JOIN __scd_staged s ON t.login = s.__merge_key
        """
    )
    # INSERT side: staged rows matching no target key
    con.execute(
        """
        CREATE OR REPLACE TEMP VIEW __inserts AS
        SELECT CAST(NULL AS INT) AS dim_user_id, s.login, s.premium_user,
               s.address, s.phone, s.name, s.surname, s.year_of_birth,
               s.__new_version AS scd_version,
               """
        + AS_OF_SQL
        + """ AS scd_start_date,
               TIMESTAMP '9999-12-31 23:59:59' AS scd_end_date, true AS scd_active
        FROM __scd_staged s
        WHERE NOT EXISTS (SELECT 1 FROM dim t WHERE t.login = s.__merge_key)
        """
    )
    return con.execute(
        "SELECT * FROM __after_updates UNION ALL SELECT * FROM __inserts"
    ).fetchall()


def test_generated_merge_matches_dataframe_plan(spark, duck):
    prod = spark.createDataFrame(
        [
            (1, "user1", True, "address1", "123456789", "John", "Doe", 1980, 1, T0, EOT, True),
            (2, "user2", False, "address2", None, "Alice", "Smith", 1990, 1, T0, EOT, True),
        ],
        PROD_SCHEMA,
    )
    staging = spark.createDataFrame(
        [
            ("user1", "John", "Doe", 1985, True, "address1", "987654321"),
            ("user2", "Alice", "Smith", 1990, True, "address2", None),
            ("user3", "Emma", "Johnson", 1985, True, "address3", "987654321"),
        ],
        STG_SCHEMA,
    )
    df_rows = {
        (r["login"], r["scd_version"]): (
            r["premium_user"], r["address"], r["phone"], r["name"],
            r["surname"], r["year_of_birth"], r["scd_start_date"],
            r["scd_end_date"], r["scd_active"],
        )
        for r in scd2_merge(prod, staging, CFG, AS_OF,
                            key_strategy="row_number").collect()
    }

    cols = ("dim_user_id login premium_user address phone name surname "
            "year_of_birth scd_version scd_start_date scd_end_date scd_active").split()
    sql_rows = {}
    for row in _emulate_merge(duck, CFG):
        d = dict(zip(cols, row))
        sql_rows[(d["login"], d["scd_version"])] = (
            d["premium_user"], d["address"], d["phone"], d["name"],
            d["surname"], d["year_of_birth"], d["scd_start_date"],
            d["scd_end_date"], d["scd_active"],
        )
    assert sql_rows == df_rows and len(sql_rows) == 5


def test_statement_structure(spark):
    stmts = scd2_merge_statements(CFG, as_of_expr=AS_OF_SQL)
    assert len(stmts) == 2 and stmts[0].startswith("CREATE OR REPLACE TEMP VIEW")
    merge = stmts[1]
    assert merge.startswith("MERGE INTO dim t")
    assert "ON t.login = s.__merge_key" in merge
    # null-safe change predicate over ALL type-2 columns
    for c in CFG.type2_cols:
        assert f"NOT (t.{c} <=> s.{c})" in merge
    # close-out clause precedes the bare Type-1 clause (MERGE fires the
    # first satisfied WHEN)
    assert merge.index("scd_active = false") < merge.index("WHEN MATCHED THEN")
    assert "s.__new_version" in merge and "WHEN NOT MATCHED THEN" in merge


def test_merge_sql_no_subqueries_in_actions(spark):
    """Delta rejects subqueries inside MERGE actions — the inserted
    version must come from the staged view, not a scalar subquery."""
    merge = merge_into_sql(CFG, "dim", "__scd_staged", as_of_expr=AS_OF_SQL)
    actions = merge[merge.index("WHEN MATCHED") :]
    assert "SELECT" not in actions
