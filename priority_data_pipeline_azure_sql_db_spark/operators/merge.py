"""MERGE / upsert semantics for incremental loads (SURVEY.md §4, §7 risk #1).

The reference re-fetches from ``lastRun`` with ``ge`` (inclusive) and
blind-appends, so overlapping windows duplicate rows
(reference resources/priorityDataSource.py:660-663, :871-876) — a defect we fix,
not port. Without Delta in this image, MERGE is emulated the classic way:

    target ⟵ (target ANTI-JOIN delta ON pk) UNION ALL delta

which is exactly the plan Delta's MERGE INTO produces for
whole-row-replace. One shuffle on the PK for the anti join (broadcast when
the delta is small — the common incremental case, which AQE converts
automatically); at 100 TB you'd additionally partition the target by the
watermark date so only touched partitions rewrite.

``dedup_within`` handles the delta's own duplicates (a re-fetched window
can contain the same PK twice across retries): latest-wins by an ordering
column, via max_by-style window — deterministic, unlike dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_within(df: DataFrame, pk: list[str], order_col: str | None = None) -> DataFrame:
    """Keep exactly one row per PK. With ``order_col``, latest-wins
    (deterministic); otherwise an arbitrary-but-single row via
    ``dropDuplicates`` (map-side partial agg, cheapest)."""
    if order_col is None:
        return df.dropDuplicates(pk)
    w = Window.partitionBy(*pk).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(target: DataFrame, delta: DataFrame, pk: list[str]) -> DataFrame:
    """Upsert ``delta`` into ``target`` on ``pk`` — delta wins on conflict.

    Equivalent SQL: ``MERGE INTO target USING delta ON pk WHEN MATCHED THEN
    UPDATE * WHEN NOT MATCHED THEN INSERT *``. Columns must match.
    """
    kept = target.join(delta.select(*pk), on=pk, how="left_anti")
    return kept.unionByName(delta)
