"""The reference tutorial, replayed on this engine.

Runs the exact worked example from
/root/reference/README.md (2-row production + 3-row staging ->
5-row next version) through ``scd2_merge`` and prints every table, so a
user of the reference can see their 8-statement HiveQL pipeline
(SCD_script.txt steps 1-8) as one engine call. The printed final state
matches README.md:306-320 modulo row order and the frozen ``as_of``
timestamp (the reference's own two documents disagree on tie order and
show per-statement timestamp drift; see SURVEY.md §5).

Run: python examples/dim_user_tutorial.py
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from implementing_scds_in_hive_spark.operators.merge_sql import scd2_merge_statements
from implementing_scds_in_hive_spark.operators.scd import SCDConfig, scd2_merge
from implementing_scds_in_hive_spark.session import get_spark

EOT = datetime(9999, 12, 31, 23, 59, 59)
T0 = datetime(2024, 4, 1)
AS_OF = datetime(2024, 5, 1, 12, 0, 0)

CFG = SCDConfig(
    key="login",
    type2_cols=("premium_user", "address", "phone"),
    type1_cols=("name", "surname", "year_of_birth"),
    surrogate_col="dim_user_id",
)

PROD_DDL = (
    "dim_user_id int, login string, premium_user boolean, address string, "
    "phone string, name string, surname string, year_of_birth int, "
    "scd_version int, scd_start_date timestamp, scd_end_date timestamp, "
    "scd_active boolean"
)
STG_DDL = (
    "login string, name string, surname string, year_of_birth int, "
    "premium_user boolean, address string, phone string"
)


def main() -> None:
    spark = get_spark("dim-user-tutorial")
    # seeds: /root/reference/README.md:55-57 and :85-88
    prod = spark.createDataFrame(
        [
            (1, "user1", True, "address1", "123456789", "John", "Doe", 1980, 1, T0, EOT, True),
            (2, "user2", False, "address2", None, "Alice", "Smith", 1990, 1, T0, EOT, True),
        ],
        PROD_DDL,
    )
    staging = spark.createDataFrame(
        [
            ("user1", "John", "Doe", 1985, True, "address1", "987654321"),
            ("user2", "Alice", "Smith", 1990, True, "address2", None),
            ("user3", "Emma", "Johnson", 1985, True, "address3", "987654321"),
        ],
        STG_DDL,
    )

    print("== dim_user_production (before) ==")
    prod.orderBy("dim_user_id").show(truncate=False)
    print("== dim_user_staging ==")
    staging.show(truncate=False)

    # the tutorial pins the reference's dense ROW_NUMBER keys, so it
    # opts into the parity strategy (the engine default is "hash")
    out = scd2_merge(prod, staging, CFG, AS_OF, key_strategy="row_number")
    print("== dim_user_production (after merge — reference steps 1-8 in one call) ==")
    out.orderBy("dim_user_id").show(truncate=False)

    rows = out.collect()
    assert len(rows) == 5, "expected the tutorial's 5-row final state"
    assert sorted(r["dim_user_id"] for r in rows) == [1, 2, 3, 4, 5]
    actives = {r["login"] for r in rows if r["scd_active"]}
    assert actives == {"user1", "user2", "user3"}
    print("final state matches /root/reference/README.md:306-320 (order-insensitive)")

    print("\n== the same merge as Delta/Iceberg SQL (lake deployment) ==")
    for stmt in scd2_merge_statements(CFG, target="dim_user_production",
                                      staging="dim_user_staging"):
        print(stmt, end="\n\n")

    # The literal 8-statement script face: the reference's workflow
    # (SCD_script.txt:3-155) executed statement-by-statement on Spark
    # SQL, proven row-identical to the one-call engine merge
    # (tests/test_sql_script.py).
    from implementing_scds_in_hive_spark.operators.sql_script import (
        cleanup_script_tables,
        run_scd2_script,
    )

    print("== the same merge as the reference's 8-statement script ==")
    script_out = run_scd2_script(
        spark, prod, staging, CFG, "2024-05-01 12:00:00",
        name_prefix="tutorial_script",
    )
    script_out.orderBy("dim_user_id").show(truncate=False)
    engine_rows = sorted(
        (tuple(str(r[c]) for c in sorted(out.columns)) for r in out.collect())
    )
    script_rows = sorted(
        (tuple(str(r[c]) for c in sorted(script_out.columns)) for r in script_out.collect())
    )
    assert engine_rows == script_rows, "script and engine paths must agree"
    cleanup_script_tables(spark, "tutorial_script")
    print("script output is row-identical to the engine merge")


if __name__ == "__main__":
    main()
