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
    # resource-attr dims for the topology exporter (the connector's
    # configurable Dimensions with client_/server_ prefixes,
    # connector.go:345-352, :621-643) — carried when the span source has
    # them, so AddConnection's endpoint fallbacks are exercisable
    carry_dims = [
        c for c in ("service_namespace", "service_instance_id") if c in spans.columns
    ]

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
        *([F.col("peer_service").alias("client_peer_service")] if has_peer else []),
        *[F.col(c).alias(f"client_{c.removeprefix('service_')}") for c in carry_dims],
    )
    server = spans.where(F.col("kind").isin(*SERVER_KINDS)).select(
        F.col("trace_id"),
        F.col("parent_span_id").alias("join_key"),
        F.col("service").alias("server"),
        dur.alias("server_latency_sec"),
        F.col("failed").alias("server_failed"),
        *[F.col(c).alias(f"server_{c.removeprefix('service_')}") for c in carry_dims],
    )

    if has_db:
        db_client = client.where(F.col("db_system").isNotNull())
        client = client.where(F.col("db_system").isNull())
    else:
        db_client = None

    dim_cols = [f"client_{c.removeprefix('service_')}" for c in carry_dims] + [
        f"server_{c.removeprefix('service_')}" for c in carry_dims
    ]
    peer_cols = ["client_peer_service"] if has_peer else []
    paired = client.join(server, on=["trace_id", "join_key"], how="inner").select(
        "trace_id",
        "client",
        "server",
        "connection_type",
        "client_latency_sec",
        "server_latency_sec",
        (F.col("client_failed") | F.col("server_failed")).alias("failed"),
        *peer_cols,
        *dim_cols,
    )

    if db_client is not None:
        # DB client-only edges (connector.go:296-301): server = db name,
        # with peer.service winning when set (FindDatabase,
        # connector.go:721-744). No server span => server-side dims NULL.
        db_edges = db_client.select(
            "trace_id",
            "client",
            (
                F.coalesce(F.col("client_peer_service"), F.col("db_system"))
                if has_peer
                else F.col("db_system")
            ).alias("server"),
            F.lit("database").alias("connection_type"),
            F.col("client_latency_sec"),
            F.lit(None).cast("double").alias("server_latency_sec"),
            F.col("client_failed").alias("failed"),
            *peer_cols,
            *[F.col(f"client_{c.removeprefix('service_')}") for c in carry_dims],
            *[
                F.lit(None).cast("string").alias(f"server_{c.removeprefix('service_')}")
                for c in carry_dims
            ],
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


def _opt(counters: DataFrame, name: str):
    return F.col(name) if name in counters.columns else F.lit(None).cast("string")


def _instance_urn(ns, service, instance_id):
    """serviceInstance URN with the reference's name fallback: a missing
    service.instance.id falls back to the service name
    (topology.go:228-236, :276-296)."""
    return F.format_string(
        "urn:opentelemetry:namespace/%s:service/%s:serviceInstance/%s",
        ns, service, F.coalesce(instance_id, service),
    )


def _service_urn(ns, service):
    return F.format_string("urn:opentelemetry:namespace/%s:service/%s", ns, service)


def _connections(counters: DataFrame) -> DataFrame:
    """Shared AddConnection preamble (topology.go:199-226): required attrs
    (client, client namespace, server, connection_type) must be present or
    the row is skipped; unknown connection types are skipped; the source
    endpoint is the client serviceInstance URN with instance-id fallback."""
    c = counters.select(
        "client",
        "server",
        "connection_type",
        _opt(counters, "client_namespace").alias("client_namespace"),
        _opt(counters, "server_namespace").alias("server_namespace"),
        _opt(counters, "client_instance_id").alias("client_instance_id"),
        _opt(counters, "server_instance_id").alias("server_instance_id"),
        _opt(counters, "client_peer_service").alias("client_peer_service"),
    )
    return c.where(
        F.col("client").isNotNull()
        & F.col("client_namespace").isNotNull()
        & F.col("server").isNotNull()
        & F.col("connection_type").isin("", "messaging_system", "database")
    ).withColumn(
        "source_id",
        _instance_urn(
            F.col("client_namespace"), F.col("client"), F.col("client_instance_id")
        ),
    )


def metrics_to_relations(counters: DataFrame) -> DataFrame:
    """A8: service-graph counters -> topology relations — the faithful
    AddConnection (ststopologyexporter/internal/topology.go:199-320):

    - source: client serviceInstance URN (instance-id falls back to name)
    - '' -> 'synchronous' to the server serviceInstance URN (requires
      server namespace, else skipped)
    - 'messaging_system' -> 'asynchronous'; with a client peer.service the
      target is the peer service URN AND a second consumer->peer relation
      is emitted (topology.go:270-296)
    - 'database' -> 'database'; with a peer the target is the peer service
      URN, else a per-(namespace, client, db) database URN whose component
      row metrics_to_components emits (topology.go:246-269)
    - relation identity: '<source>-<target>' (addRelation keyed map ->
      distinct, topology.go:321-333)

    counters must carry the connection dims (client_namespace,
    server_namespace, client_instance_id, server_instance_id,
    client_peer_service — the connector's client_/server_-prefixed
    dimension attrs); missing columns behave as absent attrs."""
    conn = _connections(counters)
    peer_target = _service_urn(F.col("client_namespace"), F.col("client_peer_service"))
    server_target = _instance_urn(
        F.col("server_namespace"), F.col("server"), F.col("server_instance_id")
    )
    db_target = F.format_string(
        "urn:opentelemetry:namespace/%s:service/%s:database/%s",
        F.col("client_namespace"), F.col("client"), F.col("server"),
    )
    has_peer = F.col("client_peer_service").isNotNull()
    has_server_ns = F.col("server_namespace").isNotNull()

    def rel(src, tgt, tname):
        return F.struct(
            src.alias("source_id"), tgt.alias("target_id"),
            F.lit(tname).alias("type_name"),
        )

    null_rel = F.lit(None).cast(
        "struct<source_id:string,target_id:string,type_name:string>"
    )
    # ONE pass: each counters row yields 0-2 relation structs via a when
    # cascade (a union of filtered branches would recompute the whole
    # counters subtree once per branch — measured 4x the work)
    primary = (
        F.when(
            (F.col("connection_type") == "") & has_server_ns,
            rel(F.col("source_id"), server_target, "synchronous"),
        )
        .when(
            (F.col("connection_type") == "messaging_system") & has_server_ns,
            rel(
                F.col("source_id"),
                F.when(has_peer, peer_target).otherwise(server_target),
                "asynchronous",
            ),
        )
        .when(
            F.col("connection_type") == "database",
            rel(
                F.col("source_id"),
                F.when(has_peer, peer_target).otherwise(db_target),
                "database",
            ),
        )
    )
    # producer->peer AND consumer->peer (topology.go:283-289)
    secondary = F.when(
        (F.col("connection_type") == "messaging_system") & has_server_ns & has_peer,
        rel(server_target, peer_target, "asynchronous"),
    ).otherwise(null_rel)
    rels = conn.select(
        F.explode(
            F.filter(F.array(primary, secondary), lambda r: r.isNotNull())
        ).alias("r")
    )
    return rels.select(
        F.concat_ws("-", F.col("r.source_id"), F.col("r.target_id")).alias("external_id"),
        F.col("r.source_id").alias("source_identifier"),
        F.col("r.target_id").alias("target_identifier"),
        F.col("r.type_name").alias("type_name"),
    ).distinct()


def metrics_to_components(counters: DataFrame) -> DataFrame:
    """A8: the database component rows AddConnection creates alongside the
    'database' relation when no peer.service names the target
    (topology.go:252-269): type 'database', databases layer, tagged with
    the owning service's namespace + name. Keyed by external_id
    (collection-map semantics -> distinct)."""
    conn = _connections(counters)
    return (
        conn.where(
            (F.col("connection_type") == "database")
            & F.col("client_peer_service").isNull()
        )
        .select(
            F.format_string(
                "urn:opentelemetry:namespace/%s:service/%s:database/%s",
                F.col("client_namespace"), F.col("client"), F.col("server"),
            ).alias("external_id"),
            F.lit("database").alias("type_name"),
            F.col("server").alias("name"),
            F.lit("urn:stackpack:common:layer:databases").alias("layer"),
            F.col("client_namespace").alias("tag_service_namespace"),
            F.col("client").alias("tag_service_name"),
        )
        .distinct()
    )
