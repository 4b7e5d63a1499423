"""SQL face tour: drive the snapshot-table write verbs in SQL text.

The reference IS a SQL script (SCD_script.txt); this walkthrough shows
its modern equivalent — the lakehouse DML/DDL/maintenance surface
executed as statements (operators/sql_dml.py run_sql), parsed by
Spark's own parser and committed through the manifest protocol:
INSERT, DELETE (merge-on-read), UPDATE, a multi-clause MERGE chain,
ALTER TABLE ADD COLUMNS (pure metadata), DESCRIBE HISTORY, OPTIMIZE
APPLY (PURGE), RESTORE (carry-by-reference), and VACUUM — plus the r9
READ face (query_sql): time-travel SELECTs (VERSION AS OF), the
table_changes change-feed TVF, and a CTAS clone of a historical
version. Prints every intermediate table.

Run: python examples/sql_face_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from implementing_scds_in_hive_spark.operators.sql_dml import (
    query_sql,
    run_sql,
)
from implementing_scds_in_hive_spark.session import get_spark
from implementing_scds_in_hive_spark.sources.snapshot import (
    read_table,
    write_snapshot,
)


def main() -> None:
    spark = get_spark("sql-face-tour")
    root = os.path.join(tempfile.mkdtemp(prefix="sql_tour_"), "accounts")
    t = {"accounts": root}

    write_snapshot(
        spark.createDataFrame(
            [(1, "ann", 120.0), (2, "bo", 40.0), (3, "cy", 75.0)],
            "id long, owner string, balance double",
        ),
        root,
    )
    print("v1 (published):")
    read_table(spark, root).orderBy("id").show()

    print(run_sql(spark, "INSERT INTO accounts VALUES (4, 'di', 15.0)", t))
    print(
        run_sql(
            spark,
            "DELETE FROM accounts WHERE balance < 50",
            t,
            tier="mor",  # positional deletion vectors, no file rewritten
        )
    )
    print(
        run_sql(
            spark,
            "UPDATE accounts SET balance = balance * 1.05 WHERE id <= 2",
            t,
        )
    )
    src = spark.createDataFrame(
        [(1, 500.0), (2, -1.0), (9, 60.0)], "id long, amount double"
    )
    print(
        run_sql(
            spark,
            # a first-match-wins clause CHAIN, in textual order
            """MERGE INTO accounts AS a USING deposits AS d ON a.id = d.id
               WHEN MATCHED AND d.amount < 0 THEN DELETE
               WHEN MATCHED THEN UPDATE SET balance = a.balance + d.amount
               WHEN NOT MATCHED AND d.amount > 0 THEN INSERT (id, balance)
                   VALUES (d.id, d.amount)""",
            {**t, "deposits": src},
        )
    )
    print(
        run_sql(
            spark, "ALTER TABLE accounts ADD COLUMNS (tier string)", t
        )
    )
    print("after INSERT/DELETE/UPDATE/MERGE/ALTER:")
    read_table(spark, root).orderBy("id").show()

    print("history:")
    for e in run_sql(spark, "DESCRIBE HISTORY accounts", t)["history"]:
        print("  ", {k: e[k] for k in ("version", "mode", "n_vectored")})

    print("time-travel SELECT — the v1 state, textually (query_sql):")
    query_sql(
        spark,
        "SELECT id, owner, balance FROM accounts VERSION AS OF 1 "
        "ORDER BY id",
        t,
    ).show()
    print("change feed v1 -> latest (table_changes TVF):")
    query_sql(
        spark,
        "SELECT op, id, balance FROM "
        f"table_changes('accounts', 1, {len(run_sql(spark, 'DESCRIBE HISTORY accounts', t)['history'])}, 'id') "
        "ORDER BY id",
        t,
    ).show()
    clone = os.path.join(os.path.dirname(root), "accounts_v1_clone")
    print(
        run_sql(
            spark,
            "CREATE TABLE clone AS SELECT * FROM accounts VERSION AS OF 1",
            {**t, "clone": clone},
        ),
        "(a physical clone of the historical version)",
    )

    print(run_sql(spark, "OPTIMIZE accounts APPLY (PURGE)", t))
    print(run_sql(spark, "RESTORE TABLE accounts TO VERSION AS OF 1", t))
    print("restored to v1 (carry-by-reference — no data rewritten):")
    read_table(spark, root).orderBy("id").show()
    print(run_sql(spark, "VACUUM accounts RETAIN 0 HOURS", t, keep_last=1))

    shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
