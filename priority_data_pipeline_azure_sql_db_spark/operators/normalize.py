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


def align_schemas(target: DataFrame, delta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema evolution at the merge boundary: widen BOTH sides to the
    union of their columns. Missing columns become typed nulls; a column
    present on both sides keeps the TARGET's type (the stored table wins —
    the delta is cast, mirroring cast_to_schema's boundary rule). Column
    order: target's columns first, then the delta's new ones.

    This is what lets an incremental pipeline survive a source adding a
    field mid-stream: old rows read back with nulls in the new column,
    new rows carry it, nothing is silently dropped (the previous behavior
    was ``delta.select(*target.columns)`` — new source fields vanished).
    """
    t_types = {f.name.lower(): f.dataType for f in target.schema.fields}
    d_types = {f.name.lower(): f.dataType for f in delta.schema.fields}
    ordered = [f.name for f in target.schema.fields] + [
        f.name for f in delta.schema.fields if f.name.lower() not in t_types
    ]

    def widen(df: DataFrame, own: dict, other: dict, cast_to_other: bool) -> DataFrame:
        cols = []
        for name in ordered:
            ln = name.lower()
            if ln in own:
                dt = other.get(ln) if cast_to_other else None
                col = F.col(name)
                if dt is not None and dt != own[ln]:
                    col = col.cast(dt)
                cols.append(col.alias(name))
            else:
                cols.append(F.lit(None).cast(own.get(ln) or other[ln]).alias(name))
        return df.select(*cols)

    return (
        widen(target, t_types, d_types, cast_to_other=False),
        widen(delta, d_types, t_types, cast_to_other=True),
    )
