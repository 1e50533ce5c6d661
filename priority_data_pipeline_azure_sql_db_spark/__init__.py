"""priority_data_pipeline_azure_sql_db_spark — a PySpark-native analytics/ELT engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``talc87/priority_data_pipeline_azure_sql_db``
(a config-driven OData → Azure SQL ELT service; see SURVEY.md), rebuilt on
the PySpark DataFrame/SQL API so Catalyst + Tungsten own planning and
execution, plus the generic relational / dedup / similarity / text-analysis
surface a large-scale (100 TB) training-data pipeline needs.

Layout
------
- ``session``    — SparkSession factory (AQE on, UTC session tz, tuned shuffle)
- ``catalog``    — explicit StructType registry + Edm→Spark type mapping
- ``config``     — extractionConfig model (entities, watermarks, timezones)
- ``sources``    — parquet/JDBC readers with explicit schemas; OData-style source
- ``operators``  — flatten/audit/watermark/merge/dedup/similarity/text ops
- ``pipeline``   — the ELT runner (initial load / incremental refresh)
- ``ddl``        — staging/DWH table DDL semantics (PK→varchar at sink only)
- ``streaming``  — Structured Streaming surface over event streams
"""

__version__ = "0.1.0"
