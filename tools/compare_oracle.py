"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB, compare row count,
column names, and an order-insensitive value hash.

The comparison deliberately goes through PANDAS on both sides (Spark
``toPandas()``, DuckDB ``.df()``), replicating the driver's own
``_canon`` comparator (visible in the CORRECTNESS_r05 traceback):

- DuckDB converts HUGEINT (e.g. any value derived from ``SUM(BIGINT)``)
  to **float64** in ``.df()`` — an oracle that forgets to CAST such a
  column back to BIGINT hashes as ``3.0`` vs Spark's ``3`` and FAILS
  here exactly as it fails at the driver (this was r5's
  pack_training_sequences red row; a ``fetchall()``-based comparison
  hides it because HUGEINT→Python int).
- ``sort_values`` over every column dies with ``unhashable type:
  'list'`` on array-valued cells — replicated here as a loud driver-ERR
  so list-returning queries are caught before registration (r5's
  embedding_normalize red row).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import os

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from priority_data_pipeline_azure_sql_db_spark.catalog import TABLES  # noqa: E402
from priority_data_pipeline_azure_sql_db_spark.session import get_spark  # noqa: E402


def normalize_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):  # incl. numpy float64 (subclass of float):
        # a HUGEINT column arriving as float64 normalizes to "3.0" ≠ "3"
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # render through the FLOAT path: the DuckDB side of a DECIMAL
        # column arrives as float64 from .df(), and Decimal.normalize()
        # emits scientific notation for trailing-zero integral values
        # ('3E+2' for 300) — equal values would hash differently
        # (review finding; the repo convention is to never RETURN
        # decimals, but the gate itself must not false-fail)
        return normalize_cell(float(v))
    if isinstance(v, datetime.datetime):  # incl. pd.Timestamp
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)  # numpy int64 → "3"; everything else str()


def canon_pandas(pdf):
    """The driver's _canon: lowercase + name-sort columns, sort_values
    over ALL of them (raises TypeError on unhashable list cells — that
    IS the driver behavior, surface it), NaN-safe via na_position."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, na_position="last").reset_index(drop=True)


def row_lines(pdf) -> list[str]:
    """One sorted line per row. Cells are LENGTH-PREFIXED before the
    '|' join so the encoding is injective — ('a|b','c') and ('a','b|c')
    used to serialize identically, a false-PASS class for text cells
    containing pipes (review finding). NaT normalizes to NULL here, the
    ONE place both the hash and the mismatch printer go through."""
    import pandas as pd

    def cell(v) -> str:
        s = normalize_cell(None if v is None or v is pd.NaT else v)
        return f"{len(s)}:{s}"

    return sorted(
        "|".join(cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def table_hash(pdf) -> str:
    h = hashlib.sha256()
    for line in row_lines(pdf):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    # any '/'-bearing arg is a fixture dir regardless of position — an
    # sf_dir passed AFTER query names used to be silently dropped and
    # the default sf0.01 ran instead (review finding)
    dirs = [a for a in args if "/" in a]
    if len(dirs) > 1:
        print(f"ERROR: multiple fixture dirs given: {dirs}", file=sys.stderr)
        return 2
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
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

    # a misspelled subset name used to skip everything and exit 0 —
    # '0 pass, 0 fail' read as green in scripted gates (review finding)
    unknown = [n for n in only if n not in queries]
    if unknown:
        print(f"ERROR: not in the registry: {unknown}", file=sys.stderr)
        return 2

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spdf = df.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        scols = sorted(c.lower() for c in spdf.columns)
        ocols = sorted(c.lower() for c in odf.columns)
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(odf)}")
        if scols != ocols:
            problems.append(f"cols spark={scols} duck={ocols}")
        if not problems:
            try:
                cs, co = canon_pandas(spdf), canon_pandas(odf)
            except TypeError as exc:
                # the driver dies here on list-typed columns → ERR row
                print(f"FAIL  {name}: driver-ERR (comparator cannot canon: {exc})")
                n_fail += 1
                continue
            hs, ho = table_hash(cs), table_hash(co)
            if hs != ho:
                problems.append(f"valuehash spark={hs} duck={ho}")
                # diagnostics through the SAME normalization the hash
                # used (the old inline copy printed NaT where the hash
                # saw NULL), as SET DIFFERENCES — zipping two sorted
                # lists pairs unrelated rows once one insertion shifts
                # alignment (review finding)
                ls, lo = row_lines(cs), row_lines(co)
                for a in [x for x in ls if x not in set(lo)][:3]:
                    print(f"      spark-only: {a[:200]}")
                for b in [x for x in lo if x not in set(ls)][:3]:
                    print(f"      duck-only : {b[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
