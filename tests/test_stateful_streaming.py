"""applyInPandasWithState edge store: completed pairs match the batch
pair-join; unmatched singles stay in state (or expire)."""

from __future__ import annotations

import datetime as dt

from sts_opentelemetry_collector_spark.streaming.stateful import streaming_edge_store

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, kind string, "
    "service string, start_ts double, end_ts double, failed boolean"
)


def test_edge_store_completes_pairs(spark, tmp_path):
    rows = [
        ("t1", "c1", "", "CLIENT", "frontend", 0.0, 0.5, False),
        ("t1", "s1", "c1", "SERVER", "checkout", 0.1, 0.4, False),
        ("t2", "c2", "", "CLIENT", "frontend", 0.0, 1.5, True),
        ("t2", "s2", "c2", "SERVER", "cart", 0.1, 1.2, False),
        ("t3", "c3", "", "CLIENT", "frontend", 0.0, 0.2, False),  # unmatched
    ]
    src = str(tmp_path / "spans")
    spark.createDataFrame(rows, SPAN_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(SPAN_SCHEMA).parquet(src)
    edges = streaming_edge_store(stream)
    out = str(tmp_path / "edges")
    q = (
        edges.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.trace_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"t1", "t2"}  # t3 single stays in state
    assert got["t1"].client == "frontend" and got["t1"].server == "checkout"
    assert got["t1"].status == "complete"
    assert abs(got["t1"].client_latency_sec - 0.5) < 1e-9
    assert got["t2"].failed is True  # failure propagates from either side
    assert got["t1"].failed is False
