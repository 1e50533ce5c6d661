"""Streaming over the events table.

The reference's closest analog is the batch high-watermark bookmark (O4);
the streaming surface is net-new Tier B (SURVEY.md §2.2). Modeled as
Structured Streaming: file source → event-time watermark → tumbling /
session windows → memory sink for tests (real deployments: Kafka in,
Delta/JDBC out via foreachBatch for exactly-once).

Scale note: watermark + windowed aggregation keeps state bounded — state
store only holds open windows newer than (max event time − watermark),
so throughput is O(input), not O(history).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema — file
    streams can't infer).

    ``ts`` has shipped as both TIMESTAMP(NANOS) and timestamp[us] across
    fixture generations, so the on-disk type is probed from the footer
    (a batch-read schema call — metadata only, no data scan) and the
    stream schema + µs conversion adapt to it, mirroring the conditional
    in sources/parquet.py:load_table."""
    import os

    # self-provision for vanilla sessions: the vectorized reader rejects
    # TIMESTAMP(NANOS) unless it's read back as long (see sources/parquet.py)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    footer = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_type = dict((f.name, f.dataType.simpleString()) for f in footer).get("ts")
    raw_schema = (
        f"event_id bigint, ts {ts_type}, user_id bigint, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window counts per event_type, late data handled
    by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), the streaming twin of the
    batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame, keys: tuple[str, ...] = ("event_id",),
                        watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact deduplication on a key set.

    ``dropDuplicatesWithinWatermark`` keeps the first arrival per key and
    expires key state once the watermark passes it — state is
    O(keys within the watermark horizon), not O(stream history), which is
    what makes exactly-once re-delivery handling viable on an unbounded
    source (the streaming twin of ``operators.dedup.dedup_exact``).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def click_error_join_stream(spark: SparkSession, sf_dir: str,
                            window_seconds: int = 60,
                            watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each click pairs with the errors the
    same user raised within the next ``window_seconds``.

    Both sides carry an event-time watermark and the join condition bounds
    error_ts to (click_ts, click_ts + window] — together these let Spark
    expire join state for rows older than the watermark minus the
    interval, so state is bounded by the time window, not the stream. The
    batch twin is ``range_join_close_events``'s bucketized form.
    """
    # ONE source read: the footer-schema probe + nanosAsLong conf-set
    # inside read_events_stream need to run once, not per join side
    # (round-12 review)
    src = read_events_stream(spark, sf_dir)
    clicks = (
        src
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        src
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("error_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    return clicks.join(
        errors,
        F.expr(
            f"""click_user = error_user
                AND error_ts > click_ts
                AND error_ts <= click_ts + INTERVAL {window_seconds} SECONDS"""
        ),
        "inner",
    ).select("click_id", "error_id")


def run_streaming_to_memory(agg: DataFrame, mode: str = "complete",
                            timeout_s: float | None = None) -> DataFrame:
    """Drive a streaming aggregation to completion synchronously against a
    memory sink (test harness path) and return the final batch result.

    The memory sink pins the full result in DRIVER heap under a
    uniquely-named temp view — without the drop below, every call in a
    comparator/bench session leaks one complete result for the session
    lifetime (the cached-relation-per-serve leak class). The result is
    detached into a local-backed DataFrame first; memory sinks are
    driver-sized by design (this is the harness path, never a
    production sink), so the copy does not change the asymptotics."""
    spark = agg.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    # bounded like the sink drains (round-12 review): the documented
    # state-store wedge class must surface as an error row, not hang
    # the whole comparator/bench session forever. The bound is a knob
    # (round-13 ADVICE fix): a legitimately slow but healthy drain —
    # larger scale factor, loaded host — must be raisable without a
    # code edit (param, else SPARK_GRAFT_STREAM_TIMEOUT_S, else 300).
    if timeout_s is None:
        timeout_s = float(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S", 300))
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming drain did not finish within {timeout_s:g}s"
        )
    sunk = spark.sql(f"SELECT * FROM {name}")
    out = spark.createDataFrame(sunk.collect(), sunk.schema)
    spark.catalog.dropTempView(name)
    return out


def sliding_counts(events: DataFrame, window: str = "2 hours",
                   slide: str = "1 hour",
                   watermark: str = "30 minutes") -> DataFrame:
    """Sliding event-time windows: each event contributes to
    window/slide overlapping windows (2 at the default 2h/1h). The
    uncovered streaming-window shape next to tumbling and session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         on: str = "event_type") -> DataFrame:
    """Stream-static join: the canonical enrichment shape — the static
    side is planned per micro-batch (broadcast, no state, no watermark
    needed on the dim). Aggregates enriched counts per category."""
    return (
        events.join(F.broadcast(dim), on)
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
