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


_ORDERS_EDMX = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" Version="4.0">
  <edmx:DataServices>
    <Schema xmlns="http://docs.oasis-open.org/odata/ns/edm" Namespace="Fixture.OData">
      <EntityType Name="orders">
        <Key><PropertyRef Name="o_orderkey"/></Key>
        <Property Name="o_orderkey" Type="Edm.Int64" Nullable="false"/>
        <Property Name="o_custkey" Type="Edm.Int64"/>
        <Property Name="o_orderstatus" Type="Edm.String"/>
        <Property Name="o_totalprice" Type="Edm.Double"/>
        <Property Name="o_orderdate" Type="Edm.DateTimeOffset"/>
        <Property Name="o_orderpriority" Type="Edm.String"/>
      </EntityType>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>"""


def test_edmx_driven_schema_discovery(spark, sf_dir):
    """O1+O2 integration: the source discovers its schema from $metadata
    EDMX (the reference's flow) instead of the backend footer, and reads
    the same rows under it."""
    register(spark)
    via_edmx = (
        spark.read.format(FORMAT_NAME)
        .option("path", sf_dir).option("entity", "orders")
        .option("edmx", _ORDERS_EDMX)
        .load()
    )
    via_footer = (
        spark.read.format(FORMAT_NAME)
        .option("path", sf_dir).option("entity", "orders")
        .load()
    )
    assert via_edmx.schema == via_footer.schema
    assert via_edmx.count() == via_footer.count()
    assert via_edmx.exceptAll(via_footer).count() == 0

    import pytest

    with pytest.raises(Exception, match="not in .metadata"):
        (spark.read.format(FORMAT_NAME)
         .option("path", sf_dir).option("entity", "nope")
         .option("edmx", _ORDERS_EDMX).load()).count()
