"""Incremental / high-watermark filtering (SURVEY.md §2.1 O3/O4).

The reference's only predicate: ``$filter=<field> ge <tz-localized ts>``
built by hand into the OData URL (reference resources/priorityDataSource.py:656-685),
lower bound = ``lastRun`` (incremental) or ``dataStartDate`` (full load).

Spark-native: a plain ``col >= lit(ts)`` filter. Catalyst pushes it into
the parquet scan (row-group pruning via min/max stats) or through JDBC —
verify with ``PushedFilters`` in ``explain('formatted')``. At 100 TB with
date-partitioned layout this becomes partition pruning: whole directories
skipped, which is the difference between scanning a day and scanning
a decade.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermark_filter(df: DataFrame, field: str, lower_bound: datetime | str | None) -> DataFrame:
    """Rows with ``field >= lower_bound`` (inclusive, matching OData ``ge``).

    ``lower_bound=None`` means unfiltered (filterFlag=false entities load
    whole, reference resources/priorityDataSource.py:656).
    """
    if lower_bound is None:
        return df
    bound = F.lit(lower_bound).cast("timestamp") if isinstance(lower_bound, str) else F.lit(lower_bound)
    return df.filter(F.col(field) >= bound)
