"""Custom OData-shaped Python DataSource tests (O1 connector)."""

from pyspark.sql import functions as F

from priority_data_pipeline_azure_sql_db_spark.sources.odata_like import FORMAT_NAME, register
from priority_data_pipeline_azure_sql_db_spark.sources.parquet import load_table


def read_entity(spark, sf_dir, entity, **opts):
    register(spark)
    r = spark.read.format(FORMAT_NAME).option("path", sf_dir).option("entity", entity)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_scan_matches_parquet(spark, sf_dir):
    src = read_entity(spark, sf_dir, "orders")
    direct = load_table(spark, sf_dir, "orders")
    assert src.count() == direct.count()
    assert [f.name for f in src.schema.fields] == [f.name for f in direct.schema.fields]


def test_filter_pushdown_equivalence(spark, sf_dir):
    bound = F.lit("1998-01-01").cast("timestamp")
    src = read_entity(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= bound)
    direct = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= bound)
    assert src.count() == direct.count()
    got = {r.o_orderkey for r in src.collect()}
    want = {r.o_orderkey for r in direct.collect()}
    assert got == want


def test_partitioned_parallel_scan(spark, sf_dir):
    src = read_entity(spark, sf_dir, "orders", numpartitions="4")
    assert src.rdd.getNumPartitions() == 4
    assert src.count() == load_table(spark, sf_dir, "orders").count()


def test_nanos_timestamp_entity(spark, sf_dir):
    ev = read_entity(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() == 10000 or ev.count() > 0


def test_missing_options_raise(spark):
    import pytest

    register(spark)
    with pytest.raises(Exception, match="path, entity|PYTHON_DATA_SOURCE"):
        spark.read.format(FORMAT_NAME).load().count()
