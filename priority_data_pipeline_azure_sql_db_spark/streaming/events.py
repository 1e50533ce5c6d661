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

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import schema_for


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema — file
    streams can't infer). ts is TIMESTAMP(NANOS) on disk → long + µs convert
    (see sources/parquet.py)."""
    raw_schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    # self-provision for vanilla sessions: the vectorized reader rejects
    # TIMESTAMP(NANOS) unless it's read back as long (see sources/parquet.py)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


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


def run_streaming_to_memory(agg: DataFrame, mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation to completion synchronously against a
    memory sink (test harness path) and return the final batch result."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")
