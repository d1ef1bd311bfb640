"""Service-graph connector: span pair-join -> edge metrics -> relations.

Reference (connector/stsservicegraphconnector/):
- J1: client/producer spans insert edge state under their own span_id;
  server/consumer spans under parent_span_id; when both sides meet the edge
  completes (connector.go:253-343, store.go:91-129).
- Database client spans short-circuit: a client span with db attributes
  completes an edge alone, no server side (connector.go:296-301).
- A1/A3: completed edges feed per-dimension counters and explicit-bucket
  latency histograms; A2's eviction compensation is unnecessary here —
  a shuffle join is lossless, counts are exact (documented deviation).
- A8: metrics-to-relations derivation: connection_type '' -> sync,
  messaging_system -> async, database -> db + database component
  (ststopologyexporter/internal/topology.go:200-320).

Spark shape: ONE equi self-join on (trace_id, join_span_id) — broadcast if
a side is small, sort-merge otherwise; AQE handles trace-id skew. The
reference's TTL store + expiry sweep becomes a watermarked stream-stream
join in streaming mode (streaming/jobs.py); batch sees all rows so expiry
is moot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .aggregate import DEFAULT_LATENCY_BOUNDS, edge_metrics, latency_histogram

CLIENT_KINDS = ("CLIENT", "PRODUCER")
SERVER_KINDS = ("SERVER", "CONSUMER")


def build_edges(spans: DataFrame) -> DataFrame:
    """J1: complete client/server span pairs into edges.

    spans columns: trace_id, span_id, parent_span_id, kind, service,
    start_ts, end_ts, failed, and optionally peer_service / db_system.
    Returns one row per completed edge with client/server services,
    latencies (seconds), failure flag, connection_type.
    """
    has_db = "db_system" in spans.columns
    has_peer = "peer_service" in spans.columns

    dur = (
        F.col("end_ts").cast("double") - F.col("start_ts").cast("double")
    )

    client = spans.where(F.col("kind").isin(*CLIENT_KINDS)).select(
        F.col("trace_id"),
        F.col("span_id").alias("join_key"),
        F.col("service").alias("client"),
        dur.alias("client_latency_sec"),
        F.col("failed").alias("client_failed"),
        F.when(F.col("kind") == "PRODUCER", F.lit("messaging_system"))
        .otherwise(F.lit(""))
        .alias("connection_type"),
        *([F.col("db_system")] if has_db else []),
        *([F.col("peer_service")] if has_peer else []),
    )
    server = spans.where(F.col("kind").isin(*SERVER_KINDS)).select(
        F.col("trace_id"),
        F.col("parent_span_id").alias("join_key"),
        F.col("service").alias("server"),
        dur.alias("server_latency_sec"),
        F.col("failed").alias("server_failed"),
    )

    if has_db:
        db_client = client.where(F.col("db_system").isNotNull())
        client = client.where(F.col("db_system").isNull())
    else:
        db_client = None

    paired = client.join(server, on=["trace_id", "join_key"], how="inner").select(
        "trace_id",
        "client",
        "server",
        "connection_type",
        "client_latency_sec",
        "server_latency_sec",
        (F.col("client_failed") | F.col("server_failed")).alias("failed"),
    )

    if db_client is not None:
        # DB client-only edges (connector.go:296-301): server = db peer.
        db_edges = db_client.select(
            "trace_id",
            "client",
            (
                F.coalesce(*( [F.col("peer_service")] if has_peer else [] ),
                           F.col("db_system"))
                if has_peer
                else F.col("db_system")
            ).alias("server"),
            F.lit("database").alias("connection_type"),
            F.col("client_latency_sec"),
            F.lit(None).cast("double").alias("server_latency_sec"),
            F.col("client_failed").alias("failed"),
        )
        paired = paired.unionByName(db_edges)
    return paired


def service_graph_metrics(
    spans: DataFrame,
    extra_dims: list[str] | None = None,
    bounds: list[float] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Edges -> (request counters, client-latency histograms) per
    (client, server, connection_type [+extra dims])."""
    dims = ["client", "server", "connection_type"] + (extra_dims or [])
    edges = build_edges(spans)
    counters = edge_metrics(edges, dims)
    hist = latency_histogram(
        edges, dims, "client_latency_sec", bounds or DEFAULT_LATENCY_BOUNDS
    )
    return counters, hist


def metrics_to_relations(counters: DataFrame) -> DataFrame:
    """A8: service-graph counters -> topology relations
    (ststopologyexporter/internal/topology.go:200-320).

    connection_type '' -> synchronous 'calls' relation; messaging_system ->
    asynchronous; database -> 'uses' + a database component row emitted
    separately (components of type database)."""
    urn = lambda s: F.concat(F.lit("urn:service/"), s)  # noqa: E731
    rel_type = (
        F.when(F.col("connection_type") == "messaging_system", "async_calls")
        .when(F.col("connection_type") == "database", "uses")
        .otherwise("calls")
    )
    return counters.select(
        F.concat_ws("-", urn(F.col("client")), urn(F.col("server"))).alias("external_id"),
        urn(F.col("client")).alias("source_identifier"),
        urn(F.col("server")).alias("target_identifier"),
        rel_type.alias("type_name"),
        F.lit("CONNECTION").alias("dependency_type"),
        F.col("req_total"),
        F.col("req_failed_total"),
    )
