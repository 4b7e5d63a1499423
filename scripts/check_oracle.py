"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (rows sorted by their string
rendering; columns sorted by name — mirroring the driver contract in
__spark_entry__.py).

Round-1 lesson (VERDICT.md "What's wrong" #2): the driver converts
collected Spark rows THROUGH PANDAS, whose datetime64[ns] range ends at
2262-04-11 — the 9999-12-31 SCD sentinel passed this script but
hard-errored 6 driver queries. Every Spark result is therefore forced
through a ``pd.DataFrame`` round-trip here so driver-side conversion
errors reproduce locally. Also enforces the driver's 50-entry registry
budget (entries past 50 silently never run).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(cols)), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from implementing_scds_in_hive_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    if len(qs) > 50:
        over = list(qs)[50:]
        print(f"FAIL registry: {len(qs)} entries but the driver tests only the "
              f"first 50 — these would never run: {over}")
        failures.append("registry_budget")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            import pandas as pd

            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # replicate the driver's pandas conversion: values that
            # cannot round-trip (e.g. timestamps beyond datetime64[ns] —
            # pandas max 2262-04-11) must fail HERE, not in
            # CORRECTNESS_r{N}.json. pd.DataFrame alone leaves datetime
            # columns as object dtype, so coerce them the way the
            # driver's collection path does.
            pdf = pd.DataFrame(srows, columns=scols)
            for fld in sdf.schema.fields:
                if fld.dataType.typeName() in ("timestamp", "timestamp_ntz"):
                    pd.to_datetime(pdf[fld.name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_sig = table_hash(scols, srows)
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({spark_sig[0]} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        oracle_sig = table_hash(ocols, orows)
        status = "OK  " if spark_sig == oracle_sig else "FAIL"
        print(f"{status} {name}: spark={spark_sig} oracle={oracle_sig} "
              f"({time.time()-t0:.1f}s)")
        if spark_sig != oracle_sig:
            failures.append(name)
            if spark_sig[0] == oracle_sig[0] and spark_sig[1] == oracle_sig[1]:
                srender = sorted(
                    "|".join(_norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
                orender = sorted(
                    "|".join(_norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows)
                diffs = [(a, b) for a, b in zip(srender, orender) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark : {a[:200]}")
                    print(f"    oracle: {b[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
