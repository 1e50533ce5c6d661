"""Property-based tests (SURVEY.md §5.2 item 4, hypothesis).

Each property runs a bounded number of examples against the live Spark
session (examples are tiny inline DataFrames; Spark latency dominates, so
max_examples is kept small while still exploring the space).
"""

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from priority_data_pipeline_azure_sql_db_spark.config import ExtractionConfig
from priority_data_pipeline_azure_sql_db_spark.operators.flatten import (
    explode_subform,
    nest_subform,
)
from priority_data_pipeline_azure_sql_db_spark.operators.merge import merge_upsert
from priority_data_pipeline_azure_sql_db_spark.operators.watermark import watermark_filter

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

parents = st.lists(
    st.integers(min_value=0, max_value=20), min_size=1, max_size=8, unique=True
)
child_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),     # parent key (maybe orphan)
        st.integers(min_value=0, max_value=5),      # line number
        st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
    ),
    max_size=20,
)


@SETTINGS
@given(pks=parents, children=child_rows)
def test_nest_explode_roundtrip_property(spark, pks, children):
    """explode(nest(parent, child)) ≡ inner join on the parent key, for any
    parent/child key distribution including orphans and empty sub-forms."""
    parent = spark.createDataFrame([(k, f"p{k}") for k in pks], "pk long, pname string")
    child = spark.createDataFrame(
        [(k, n, float(v)) for k, n, v in children] or [(None, None, None)],
        "cpk long, line int, val double",
    ).filter(F.col("cpk").isNotNull())

    nested = nest_subform(parent, child, ["pk"], ["cpk"], "sub")
    flat = explode_subform(nested, ["pk"], "sub")
    expected = parent.join(child, parent.pk == child.cpk).drop("cpk", "pname")

    got = sorted((r.pk, r.line, round(r.val, 4)) for r in flat.collect())
    want = sorted((r.pk, r.line, round(r.val, 4)) for r in expected.collect())
    assert got == want


@SETTINGS
@given(
    base=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 100)), max_size=10, unique_by=lambda t: t[0]
    ),
    delta=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 100)), max_size=10, unique_by=lambda t: t[0]
    ),
)
def test_merge_upsert_property(spark, base, delta):
    """merge(base, delta) on pk: delta wins on conflict, nothing is lost,
    no duplicate keys — for any overlap pattern."""
    b = spark.createDataFrame(base or [(None, None)], "pk long, v long").filter(
        F.col("pk").isNotNull()
    )
    d = spark.createDataFrame(delta or [(None, None)], "pk long, v long").filter(
        F.col("pk").isNotNull()
    )
    out = {r.pk: r.v for r in merge_upsert(b, d, ["pk"]).collect()}
    want = dict(base)
    want.update(dict(delta))
    assert out == want


@SETTINGS
@given(
    offsets=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=15),
    bound=st.integers(min_value=-100, max_value=100),
)
def test_watermark_filter_property(spark, offsets, bound):
    """watermark_filter keeps exactly the rows with ts >= bound (inclusive
    lower bound, like the reference's `ge` — SURVEY.md O3)."""
    t0 = datetime(2026, 1, 1)
    rows = [(i, t0 + timedelta(hours=h)) for i, h in enumerate(offsets)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    b = t0 + timedelta(hours=bound)
    got = {r.id for r in watermark_filter(df, "ts", b.strftime("%Y-%m-%d %H:%M:%S")).collect()}
    want = {i for i, h in enumerate(offsets) if h >= bound}
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    ts=st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2030, 12, 31),
        timezones=st.just(ZoneInfo("UTC")),
    ).map(lambda d: d.replace(microsecond=0)),
    tz=st.sampled_from(["UTC", "Asia/Jerusalem", "America/New_York", "Australia/Lord_Howe"]),
)
def test_bookmark_roundtrip_property(ts, tz):
    """UTC→local-bookmark→UTC is identity in any timezone, including
    DST-transition and half-hour-offset zones (the reference stores
    bookmarks in source-system local time — SURVEY.md O23). The only
    tolerated skew is the ambiguous fall-back hour, where a local
    wall-clock string legitimately maps to two instants."""
    cfg = ExtractionConfig(datasource_name="t", system_timezone=tz)
    s = cfg.format_bookmark(ts)
    back = cfg.to_utc(s)
    delta = abs((back - ts).total_seconds())
    assert delta <= 3600, f"{ts} {tz} -> {s} -> {back}"
