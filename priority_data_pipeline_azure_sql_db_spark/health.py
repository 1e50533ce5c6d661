"""Connectivity probes (O24).

The reference exposes ``/pingApi`` (app.py:93-123), which pings its three
dependencies — MongoDB config store, SQL DWH (``pingDwh``,
resources/sqlDwh.py:68-83), and the Priority OData API — and returns a
per-dependency status dict. The Spark-native dependencies are the engine
itself, the source directory, and the staging store; each probe here is
the cheapest real round-trip against one of them ("OK" or the error
string, never an exception — mirroring pingDwh's contract).

Scale note: every probe is O(1) work — ``SELECT 1``, a LIMIT-1 scan of
one parquet footer + row group, a staging listing. Safe to call from an
orchestrator's readiness loop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .sources.parquet import load_table


def _probe(fn) -> str:
    try:
        fn()
        return "OK"
    except Exception as exc:  # pingDwh returns the error, never raises
        return f"Error: {type(exc).__name__}: {exc}"


def ping_engine(spark: SparkSession) -> str:
    """SELECT-1 round trip through the session (the pingDwh analog)."""
    return _probe(lambda: spark.sql("SELECT 1").collect())


def ping_source(spark: SparkSession, sf_dir: str, entity: str = "orders") -> str:
    """$top=1 probe against the source (the pingApi analog — the reference
    also uses a $top=1 GET as its liveness check)."""
    return _probe(lambda: load_table(spark, sf_dir, entity).limit(1).collect())


def ping_staging(store) -> str:
    """Staging-store reachability: the root must exist or be creatable."""
    def check():
        os.makedirs(store.root, exist_ok=True)
        if not os.access(store.root, os.W_OK):
            raise PermissionError(f"staging root not writable: {store.root}")
    return _probe(check)


def ping_all(spark: SparkSession, sf_dir: str, store=None) -> dict[str, str]:
    """The /pingApi response shape: one status per dependency."""
    out = {
        "engine": ping_engine(spark),
        "source": ping_source(spark, sf_dir),
    }
    if store is not None:
        out["staging"] = ping_staging(store)
    return out
