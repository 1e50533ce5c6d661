"""JDBC sink/source — the production path to Azure SQL.

The reference loads staging tables with pandas ``to_sql`` over ODBC:
single-threaded, default row-at-a-time batching, full table in RAM
(reference resources/priorityDataSource.py:891-896). The Spark equivalent is
``df.write.jdbc`` with:

- ``numPartitions`` writers in parallel (one connection each — size to
  what the database tolerates, not to the cluster);
- ``batchsize`` rows per INSERT round trip (default 1000; 10-50k is
  typical for Azure SQL);
- ``createTableColumnTypes`` carrying the reference's DDL rules
  (PK→VARCHAR(255), audit columns — from ``ddl.jdbc_column_types``);
- reads partitioned via ``partitionColumn/lowerBound/upperBound`` so the
  scan parallelizes (§4's missing parallel scan).

This container has no JDBC driver jar or reachable database, so these
helpers are exercised for option-construction only (tests) and documented
for deployment; the call shape is the entire integration surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 10_000
DEFAULT_WRITERS = 8


def jdbc_url_from_env() -> str:
    """Connection URL from SPARK_GRAFT_JDBC_URL (e.g.
    ``jdbc:sqlserver://<host>:1433;database=acc-<accountID>``); raises if
    unset — never embed credentials in code (the reference leaked them via
    an env-echo endpoint; we do not reproduce that)."""
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if not url:
        raise RuntimeError("SPARK_GRAFT_JDBC_URL not set (no database in this environment)")
    return url


def _writer(df: DataFrame, table: str, mode: str, column_types: str | None,
            batch_size: int, writers: int):
    w = (
        df.repartition(writers)
        .write.format("jdbc")
        .option("url", jdbc_url_from_env())
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    return w.mode(mode)


def jdbc_overwrite(df: DataFrame, table: str, column_types: str | None = None,
                   batch_size: int = DEFAULT_BATCH_SIZE, writers: int = DEFAULT_WRITERS) -> None:
    """O13 full-load path (``if_exists='replace'`` analog)."""
    _writer(df, table, "overwrite", column_types, batch_size, writers).save()


def jdbc_append(df: DataFrame, table: str, column_types: str | None = None,
                batch_size: int = DEFAULT_BATCH_SIZE, writers: int = DEFAULT_WRITERS) -> None:
    """O13 incremental path. For MERGE semantics against a database
    without server-side MERGE orchestration: write the delta to a temp
    table here, then issue the MERGE statement via the DB's own client —
    or land in a Delta table and let pipeline.StagingStore.merge handle it."""
    _writer(df, table, "append", column_types, batch_size, writers).save()


def jdbc_read(spark: SparkSession, table: str, partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = DEFAULT_WRITERS) -> DataFrame:
    """Partitioned JDBC scan (fixes the reference's single-request pull)."""
    r = (
        spark.read.format("jdbc")
        .option("url", jdbc_url_from_env())
        .option("dbtable", table)
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
