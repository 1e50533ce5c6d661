"""Sink connectors: JDBC (Azure SQL production path) and parquet staging
(local; see pipeline.StagingStore)."""

from .jdbc import jdbc_overwrite, jdbc_append, jdbc_read, jdbc_url_from_env  # noqa: F401
