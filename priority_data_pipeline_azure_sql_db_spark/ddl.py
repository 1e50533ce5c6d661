"""Sink DDL semantics (SURVEY.md §2.1 O15-O18).

The reference synthesizes SQLAlchemy ``Table`` DDL from metadata docs —
typed columns, composite PKs, audit columns — with two rules we preserve
at the sink boundary ONLY (never inside the engine, where they would
wreck join/sort semantics):

1. PK columns are forced to VARCHAR(255) regardless of source type
   (reference resources/sqlDwh.py:368-370);
2. every table gets ``extractionid`` VARCHAR(36) + ``extractiontimestamputc``
   DATETIME audit columns (reference resources/sqlDwh.py:379-385).

Output is a ``CREATE TABLE IF NOT EXISTS`` statement string per dialect —
usable against Azure SQL through JDBC (``createTableColumnTypes``) or as a
Spark SQL DDL. No eval(): the type mapping is the explicit dict in
catalog.py (the reference eval()'d mapping strings, resources/sqlDwh.py:372).
"""

from __future__ import annotations

from pyspark.sql import types as T

_SPARK_TO_SQL: dict[type, dict[str, str]] = {
    T.StringType: {"azuresql": "VARCHAR(MAX)", "spark": "STRING"},
    T.LongType: {"azuresql": "BIGINT", "spark": "BIGINT"},
    T.IntegerType: {"azuresql": "INT", "spark": "INT"},
    T.DoubleType: {"azuresql": "FLOAT", "spark": "DOUBLE"},
    T.TimestampType: {"azuresql": "DATETIMEOFFSET", "spark": "TIMESTAMP"},
    # Edm.Boolean is in catalog.EDM_TO_SPARK — the sink DDL must accept
    # every type the ingestion catalog admits
    T.BooleanType: {"azuresql": "BIT", "spark": "BOOLEAN"},
    T.DateType: {"azuresql": "DATE", "spark": "DATE"},
}

AUDIT_DDL = {
    "azuresql": [("extractionid", "VARCHAR(36)"), ("extractiontimestamputc", "DATETIME2")],
    "spark": [("extractionid", "STRING"), ("extractiontimestamputc", "TIMESTAMP")],
}


def _sql_type(dt: T.DataType, dialect: str) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    for cls, m in _SPARK_TO_SQL.items():
        if isinstance(dt, cls):
            return m[dialect]
    raise ValueError(f"no {dialect} mapping for {dt}")


def create_table_ddl(
    table: str,
    schema: T.StructType,
    pk: list[str],
    dialect: str = "spark",
    with_audit: bool = True,
) -> str:
    """O15/O16: CREATE TABLE IF NOT EXISTS with PK→VARCHAR(255) coercion.

    Table/column names lowercased (O9, reference resources/sqlDwh.py:220-224).
    """
    pk_set = {c.lower() for c in pk}
    # PK emitted in DECLARED order (order-preserving dedup): the PK is
    # the clustered index in Azure SQL — sorted() would lead a composite
    # key with its lowest-cardinality column and turn every by-leading-
    # key lookup into a scan
    pk_cols = list(dict.fromkeys(c.lower() for c in pk))
    cols: list[str] = []
    for f in schema.fields:
        name = f.name.lower()
        if name in pk_set:
            typ = "VARCHAR(255)" if dialect == "azuresql" else "STRING"
        else:
            typ = _sql_type(f.dataType, dialect)
        cols.append(f"{name} {typ}")
    if with_audit:
        cols += [f"{n} {t}" for n, t in AUDIT_DDL[dialect]]
    body = ", ".join(cols)
    if dialect == "azuresql" and pk:
        body += f", PRIMARY KEY ({', '.join(pk_cols)})"
    return f"CREATE TABLE IF NOT EXISTS {table.lower()} ({body})"


def account_db_name(account_id: str) -> str:
    """Per-account database naming (the reference names DWH databases
    ``acc-<accountID>``, resources/sqlDwh.py:247-260). Spark/HMS identifiers
    reject dashes, so the name is normalized to ``acc_<id>`` lowercase with
    non-alphanumerics mapped to underscores."""
    safe = "".join(c if c.isalnum() else "_" for c in str(account_id).lower())
    return f"acc_{safe}"


def database_exists(spark, name: str) -> bool:
    """O18: the ``ifDbExist`` check (reference resources/sqlDwh.py:229-250)
    against the Spark catalog."""
    return spark.catalog.databaseExists(name)


def ensure_database(spark, account_id: str) -> str:
    """O18: CREATE DATABASE IF NOT EXISTS for an account and return its
    name (reference ``createDb``, resources/sqlDwh.py:258-276). Idempotent;
    the catalog entry backs ``spark.sql('USE ...')`` / saveAsTable sinks."""
    name = account_db_name(account_id)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    return name


def drop_database(spark, name: str) -> bool:
    """Drop an account database if present (EP3's metadata-platform reset
    analog). Returns whether it existed."""
    existed = database_exists(spark, name)
    if existed:
        spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    return existed


def jdbc_column_types(schema: T.StructType, pk: list[str]) -> str:
    """The ``createTableColumnTypes`` option string for ``df.write.jdbc`` —
    how the DDL rules reach a real Azure SQL sink."""
    pk_set = {c.lower() for c in pk}
    parts = []
    for f in schema.fields:
        name = f.name.lower()
        typ = "VARCHAR(255)" if name in pk_set else _sql_type(f.dataType, "azuresql")
        if typ == "VARCHAR(MAX)":
            typ = "VARCHAR(8000)"  # createTableColumnTypes rejects MAX
        parts.append(f"{name} {typ}")
    return ", ".join(parts)
