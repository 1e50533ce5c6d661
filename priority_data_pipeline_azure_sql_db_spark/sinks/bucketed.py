"""Bucketed tables: co-located fact↔fact joins with zero shuffle.

At 100 TB the orders↔lineitem join is the dominant exchange: both sides
shuffle on the order key for every query that flattens sub-forms. Writing
both tables bucketed by that key (``bucketBy(n, key).sortBy(key)``) makes
the join a zero-exchange sort-merge — each bucket pair joins locally, and
the sort is already satisfied on read. This is the Spark-native analog of
the co-partitioned staging layout the reference's Azure SQL DWH would
use clustered indexes for (reference resources/sqlDwh.py:320-390 creates
PK'd tables but never exploits them; we do).

Bucket count guidance: buckets ≈ total data / target partition size
(128-256 MB) rounded to a power of two; both join sides MUST use the
same count (Spark requires equal bucket counts to elide the exchange).

Bucketed writes require a saveAsTable (catalog-managed) target — plain
``parquet(path)`` cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int = 32, mode: str = "overwrite") -> None:
    """Persist ``df`` as a catalog table bucketed+sorted by ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .mode(mode)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   left_key: str, right_key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    With matching bucket specs Catalyst plans SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_scale_utils.py) —
    the shuffle happened once at write time and is amortized over every
    subsequent join, which is exactly the right trade for a staging
    layer that is written once per load and queried many times.
    """
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key], how)
