"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from priority_data_pipeline_azure_sql_db_spark.catalog import TABLES  # noqa: E402
from priority_data_pipeline_azure_sql_db_spark.session import get_spark  # noqa: E402


def normalize_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows: list[tuple], col_names: list[str]) -> str:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    if vanilla:
        # rehearse the real driver: a VANILLA SparkSession with none of
        # session.py's confs — every runtime-settable conf the engine
        # needs must be self-provisioned inside the query paths
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-compare-vanilla")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-compare")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(rows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        scols = [c.lower() for c in cols]
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(rows, scols), table_hash(orows, ocols)
            if hs != ho:
                problems.append(f"valuehash spark={hs} duck={ho}")
                # show a few diff lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(normalize_cell(r[i]) for i in order_s) for r in rows)
                lo = sorted("|".join(normalize_cell(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark: {a[:200]}\n      duck : {b[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(rows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
