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

import datetime as _dt

import duckdb
import numpy as np
import pandas as pd


def _norm(v):
    # post-pandas values: unwrap numpy scalars/arrays first so both
    # engines' results render identically (np.int64 -> int, ndarray -> list)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    elif isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "NULL"
    # DuckDB's fetchdf materializes DATE columns as midnight
    # datetime64[ns] while Spark's collect yields datetime.date —
    # render a time-less tz-naive datetime as its date so the two
    # meet (driver-green date-output queries prove this equivalence)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return str(v.date())
        return str(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def spark_pandas_rows(sdf) -> tuple[list[str], list[tuple]]:
    """Replicate the driver's collection path: the Spark result goes
    through ``toPandas()`` (and the DuckDB side through ``fetchdf``), so
    dtype coercions the driver performs (HUGEINT -> float64,
    int-with-null -> float64+NaN, timestamp -> datetime64[ns] raising
    beyond 2262-04-11) reproduce locally (r2 verdict "What's wrong" #2:
    sessionize passed locally via fetchall but hash-failed on the
    driver's pandas path)."""
    pdf = sdf.toPandas()
    return list(pdf.columns), list(pdf.itertuples(index=False, name=None))


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
            # the driver converts the Spark result THROUGH PANDAS; hash
            # the post-pandas values so driver-side coercions (and
            # conversion errors, e.g. timestamps past datetime64[ns]'s
            # 2262-04-11 ceiling) reproduce here, not in CORRECTNESS.
            scols, srows = spark_pandas_rows(fn(spark, sf_dir))
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
            # fetchdf, NOT fetchall: the HUGEINT->float64 (and
            # int-with-null->NaN) coercions happen inside DuckDB's
            # pandas materialization — fetchall returns exact Python
            # ints and masked the driver's sessionize hash mismatch (r2).
            odf = con.execute(oracles[name]).fetchdf()
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
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
