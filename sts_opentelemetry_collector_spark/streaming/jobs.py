"""Structured Streaming variants of the pipeline operators.

The reference is an always-on stream processor; our batch job is the
primary mode (SURVEY.md §3.1), but each stateful operator has a streaming
twin here:

- ingest: file-source readStream over the webtext directory (stand-in for
  Kafka/OTLP); Trigger.AvailableNow processes the backlog then stops —
  the batch/stream unification point.
- dedup D1-D3: dropDuplicatesWithinWatermark on the projection key — the
  reference's TTL'd dedup cache (deduplicator.go:151-205) becomes
  watermark-bounded state.
- windowed rollup A4/A5: watermark + tumbling window, late data beyond
  the watermark dropped (the reference's 15-min stale-series GC analog).
- service-graph J1: stream-stream inner join with event-time range —
  the edge store TTL (store.go:91-129) becomes the join watermark bound.

All state is bounded by watermarks — no unbounded driver maps, matching
the reference's capacity-bounded stores but with spill-safe distributed
state stores.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEBTEXT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_webtext_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_dedup(pages: DataFrame, key_cols: list[str], watermark: str = "30 minutes") -> DataFrame:
    """D1+D3 streaming: state-bounded exactly-once-per-key-per-watermark."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_rollup(pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """A4: watermarked tumbling-window rollup keyed (host, window)."""
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host")
    return (
        pages.select(host, "warc_ts")
        .withWatermark("warc_ts", watermark)
        .groupBy("host", F.window("warc_ts", window).alias("win"))
        .agg(F.count(F.lit(1)).alias("page_count"))
        .select(
            "host",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "page_count",
        )
    )


def streaming_pair_join(spans: DataFrame, ttl: str = "2 minutes") -> DataFrame:
    """J1 streaming: client/server spans joined within the store TTL.

    spans needs an event_ts timestamp column; the range condition bounds
    join state exactly like the reference's expiring edge store."""
    client = (
        spans.where(F.col("kind").isin("CLIENT", "PRODUCER"))
        .select(
            "trace_id",
            F.col("span_id").alias("join_key"),
            F.col("service").alias("client"),
            F.col("event_ts").alias("client_ts"),
        )
        .withWatermark("client_ts", ttl)
    )
    server = (
        spans.where(F.col("kind").isin("SERVER", "CONSUMER"))
        .select(
            "trace_id",
            F.col("parent_span_id").alias("join_key"),
            F.col("service").alias("server"),
            F.col("event_ts").alias("server_ts"),
        )
        .withWatermark("server_ts", ttl)
    )
    cond = (
        (client.trace_id == server.trace_id)
        & (client.join_key == server.join_key)
        & (server.server_ts >= client.client_ts - F.expr(f"INTERVAL {ttl}"))
        & (server.server_ts <= client.client_ts + F.expr(f"INTERVAL {ttl}"))
    )
    return client.join(server, cond, "inner").select(
        "client", "server", "client_ts", "server_ts"
    )


def run_stream_to_sink(stream_df: DataFrame, out_path: str, checkpoint: str,
                       output_mode: str = "append") -> None:
    """Drain the backlog with AvailableNow, then stop (test/CI harness)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
