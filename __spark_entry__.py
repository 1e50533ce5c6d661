"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship EP1-shaped pipeline query on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (+ Tier-B relational surface + north-star ops), each
checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from priority_data_pipeline_azure_sql_db_spark.queries import QUERIES, ORACLE_SQL, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    EP1 end-to-end: watermark filter → $expand-style nest → explode
    sub-form → lowercase+audit → revenue-per-customer aggregation.
    """
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry (omissions
    are genuinely non-SQL-expressible ops → weaker rows-only check)."""
    return dict(ORACLE_SQL)
