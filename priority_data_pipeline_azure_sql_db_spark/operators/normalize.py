"""Row-shape normalization operators (SURVEY.md §2.1 O8-O12).

All pure column-metadata or expression ops — zero shuffles, fully inside
whole-stage codegen, safe at any scale.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_ID_COL = "extractionid"
AUDIT_TS_COL = "extractiontimestamputc"


def lowercase_columns(df: DataFrame) -> DataFrame:
    """O9: lowercase every column name (reference resources/priorityDataSource.py:790,811).

    ``toDF`` is a projection rename — no shuffle, no codegen break.
    """
    return df.toDF(*[c.lower() for c in df.columns])


def add_audit_columns(df: DataFrame, run_id: str, run_ts: datetime | str) -> DataFrame:
    """O10: append the per-run audit columns carried on every row
    (reference resources/priorityDataSource.py:65-66,770-771).

    ``extractionid`` VARCHAR(36) (uuid4 per run) + ``extractiontimestamputc``.
    Literals fold into codegen — free at any scale.
    """
    ts = F.lit(run_ts).cast(T.TimestampType()) if isinstance(run_ts, str) else F.lit(run_ts)
    return df.withColumn(AUDIT_ID_COL, F.lit(run_id)).withColumn(AUDIT_TS_COL, ts)


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """O8: projection by set-difference (parent columns minus sub-form columns,
    reference resources/priorityDataSource.py:781-786). Column pruning reaches the
    scan via Catalyst."""
    present = {c.lower() for c in cols}
    return df.select(*[c for c in df.columns if c.lower() not in present])


def cast_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """O12: enforce catalog dtypes at a boundary (reference
    resources/priorityDataSource.py:922-933 reflects sink dtypes; we cast from
    the explicit catalog instead — one projection, no eval())."""
    by_name = {f.name.lower(): f.dataType for f in schema.fields}
    out: list[Column] = []
    for c in df.columns:
        tgt = by_name.get(c.lower())
        out.append(F.col(c).cast(tgt).alias(c) if tgt is not None else F.col(c))
    return df.select(*out)
