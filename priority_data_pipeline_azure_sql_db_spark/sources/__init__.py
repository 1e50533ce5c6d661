"""Source connectors: parquet fixture loader, JDBC helpers, OData-style source."""

from .parquet import load_table, register_views  # noqa: F401
