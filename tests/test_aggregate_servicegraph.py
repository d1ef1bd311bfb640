"""Aggregation (A1-A11) and service-graph (J1) tests — expected values
computed independently in pandas, mirroring the reference's table-driven
connector tests (stsservicegraphconnector/connector_test.go)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from sts_opentelemetry_collector_spark.operators.aggregate import (
    DEFAULT_LATENCY_BOUNDS,
    coalesce_envelopes,
    latency_histogram,
    usage_bytes,
    windowed_rollup,
)
from sts_opentelemetry_collector_spark.operators.service_graph import (
    build_edges,
    metrics_to_relations,
    service_graph_metrics,
)
from sts_opentelemetry_collector_spark.sources.spans import generate_spans, spans_df


@pytest.fixture(scope="module")
def spans(spark):
    return spans_df(spark, 500).cache()


def test_pair_join_completes_edges(spark, spans):
    pdf = generate_spans(500)
    clients = pdf[pdf.kind.isin(["CLIENT", "PRODUCER"])]
    servers = pdf[pdf.kind.isin(["SERVER", "CONSUMER"])]
    merged = clients.merge(
        servers, left_on=["trace_id", "span_id"], right_on=["trace_id", "parent_span_id"]
    )
    n_db = int(clients.db_system.notna().sum())
    edges = build_edges(spans)
    assert edges.count() == len(merged) + n_db
    assert edges.where("connection_type = 'database'").count() == n_db
    # unmatched singles produce no edge (reference: TTL-evicted)
    assert edges.count() < len(clients)


def test_edge_counters_exact(spark, spans):
    counters, hist = service_graph_metrics(spans)
    tot = counters.agg(F.sum("req_total"), F.sum("req_failed_total")).first()
    edges = build_edges(spans)
    assert tot[0] == edges.count()
    assert tot[1] == edges.where("failed").count()
    # histogram mass equals edge count per dims
    h = hist.agg(F.sum("count")).first()[0]
    assert h == edges.count()


def test_latency_histogram_buckets(spark):
    rows = [("a", "b", "", 0.001), ("a", "b", "", 0.003), ("a", "b", "", 99.0)]
    df = spark.createDataFrame(
        rows, "client string, server string, connection_type string, lat double"
    )
    out = latency_histogram(df, ["client", "server"], "lat").first()
    bc = out.bucket_counts
    assert len(bc) == len(DEFAULT_LATENCY_BOUNDS) + 1
    assert bc[0] == 1  # <= 0.002
    assert bc[1] == 1  # <= 0.004
    assert bc[-1] == 1  # overflow (+Inf)
    assert out["count"] == 3
    assert abs(out["sum"] - 99.004) < 1e-9


def test_metrics_to_relations(spark, spans):
    counters, _ = service_graph_metrics(spans)
    rels = metrics_to_relations(counters)
    kinds = {r.type_name for r in rels.select("type_name").distinct().collect()}
    assert kinds <= {"calls", "async_calls", "uses"}
    assert "uses" in kinds  # db edges present
    r = rels.first()
    assert r.external_id == f"{r.source_identifier}-{r.target_identifier}"


def test_windowed_rollup_salted_equals_plain(spark, webtext):
    from sts_opentelemetry_collector_spark.operators.parse import parse_pages

    pages = parse_pages(webtext).cache()
    plain = windowed_rollup(pages, keys=["host"], window="1 hour")
    salted = windowed_rollup(pages, keys=["host"], window="1 hour", salt_skew=True)
    a = {(r.host, r.window_start): r.page_count for r in plain.collect()}
    b = {(r.host, r.window_start): r.page_count for r in salted.collect()}
    assert a == b
    assert sum(a.values()) == pages.count()


def test_coalesce_envelopes_caps_and_conserves(spark):
    t = dt.datetime(2024, 3, 1)
    rows = [("m", 0, t, "x" * 1000) for _ in range(100)]
    df = spark.createDataFrame(
        rows, "data_source string, shard_id int, ts timestamp, payload string"
    )
    out = coalesce_envelopes(
        df, ["data_source", "shard_id"], "ts", "payload", max_envelope_bytes=10_000
    )
    rowsout = out.collect()
    assert sum(r.element_count for r in rowsout) == 100
    # 100 KB total / 10 KB cap = 10 envelopes
    assert len(rowsout) == 10
    assert all(r.envelope_bytes <= 10_000 for r in rowsout)
    # never merged across shard or ts (message_builder.go:207-257)
    df2 = df.unionAll(
        spark.createDataFrame(
            [("m", 1, t, "y")], "data_source string, shard_id int, ts timestamp, payload string"
        )
    )
    out2 = coalesce_envelopes(df2, ["data_source", "shard_id"], "ts", "payload", 10_000)
    assert out2.count() == 11


def test_usage_bytes(spark):
    df = spark.createDataFrame([("abc", "de"), ("f", None)], "a string, b string")
    row = usage_bytes(df, ["a", "b"]).first()
    assert row.usage_bytes == 3 + 2 + 1 + 0
    assert row.record_count == 2
