"""Structured Streaming surface over the events stream.

The reference has no streaming (batch only; time-series is an unimplemented
roadmap item — ROADMAP_explained.md:229-245). The rebuilt engine adds the
standard Spark streaming surface over the driver's ``events`` table:

  readStream (rate/file source) -> event-time transforms -> windowed aggs
  with watermarks for late data -> writeStream sinks.

``tumbling_counts``/``sliding_counts`` are written against a generic frame so
the SAME code runs in batch mode (the oracle-checked ``events_tumbling_hourly``
query) and streaming mode — Spark's unified-API property, which is the test
strategy too: batch output == streaming output on bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (with timezone).

    Depending on how the events parquet was produced, ``ts`` arrives as one
    of: bigint nanos (raw TIMESTAMP(NANOS) under the nanosAsLong conf),
    TIMESTAMP_NTZ (round-tripped parquet written by Spark), or TIMESTAMP.
    ``withWatermark`` only accepts TIMESTAMP
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), so every streaming
    entry point funnels through this. The UTC session timezone pins value
    equality between the NTZ and TZ readings.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # integer DIV: a double divide would lose precision above 2^53
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype is not None and dtype != "timestamp":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows with a watermark (state eviction bound —
    without it, streaming state grows forever at 100 TB/day rates)."""
    src = ensure_event_time(events).withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Exact decimal-cents sum: order-independent and bit-identical
            # across engines, unlike ROUND(SUM(double),2) whose half-way
            # semantics are engine/version-dependent (r01 hash-fail class).
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
            "approx_users",
        )
    )


def sliding_counts(events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding windows — each event lands in window/slide buckets."""
    src = ensure_event_time(events).withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows (gap-based) — the custom stateful operator surface.
    Batch mode runs the same expression; streaming mode keeps per-user session
    state with watermark eviction.

    Boundary semantics: ``session_window`` extends each session to
    ``last_ts + gap`` half-open, so an event at EXACTLY ``prev_ts + gap``
    starts a NEW session — oracles must use ``gap >= threshold`` (not ``>``)
    for the new-session flag. ``session_value`` sums on DECIMAL(18,2) so the
    result is order-independent and bit-identical across engines."""
    src = ensure_event_time(events).withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stream_events_from_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source readStream over the events parquet (one-file micro-batch).
    ``path`` is the parquet file/glob. The driver's raw file carries
    TIMESTAMP(NANOS) (read as bigint under the nanosAsLong conf); parquet
    written back by Spark carries TIMESTAMP_NTZ or TIMESTAMP instead —
    :func:`ensure_event_time` handles all three (mirrors frames.load_table's
    dtype guard)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return ensure_event_time(stream, "ts")


def run_stream_to_memory(stream_df: DataFrame, query_name: str, timeout_sec: int = 60):
    """Drive a streaming query to completion against the bounded file source
    (processingTime=0 drains all micro-batches) and return the query handle."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
