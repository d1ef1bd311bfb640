"""Deterministic synthetic span generator for the service-graph operator.

Shapes mirror the reference's connector tests
(stsservicegraphconnector/connector_test.go): matched client/server pairs
across a small service topology, some unmatched singles (expired in the
reference's TTL store; simply joinless here), some failed edges, and
db-client-only spans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SERVICES = ["frontend", "checkout", "payments", "cart", "shipping", "auth"]
DB_SYSTEMS = ["postgres", "redis"]


def generate_spans(n_pairs: int, seed: int = 42, unmatched_fraction: float = 0.1,
                   db_fraction: float = 0.1, fail_fraction: float = 0.15) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base = 1_700_000_000.0
    for i in range(n_pairs):
        trace = f"trace-{i:08d}"
        cli_span = f"span-c-{i:08d}"
        srv_span = f"span-s-{i:08d}"
        ci = int(rng.integers(0, len(SERVICES)))
        si = int(rng.integers(0, len(SERVICES)))
        c_svc, s_svc = SERVICES[ci], SERVICES[(si + 1) % len(SERVICES)]
        t0 = base + i * 0.001
        c_lat = float(rng.uniform(0.001, 2.0))
        s_lat = c_lat * float(rng.uniform(0.5, 0.95))
        failed = bool(rng.random() < fail_fraction)
        r = rng.random()
        if r < db_fraction:
            rows.append(
                (trace, cli_span, "", "CLIENT", c_svc, t0, t0 + c_lat, failed,
                 DB_SYSTEMS[i % len(DB_SYSTEMS)], None)
            )
        elif r < db_fraction + unmatched_fraction:
            rows.append((trace, cli_span, "", "CLIENT", c_svc, t0, t0 + c_lat, failed, None, None))
        else:
            kind_c, kind_s = ("PRODUCER", "CONSUMER") if rng.random() < 0.2 else ("CLIENT", "SERVER")
            rows.append((trace, cli_span, "", kind_c, c_svc, t0, t0 + c_lat, failed, None, None))
            rows.append((trace, srv_span, cli_span, kind_s, s_svc, t0 + 0.0001,
                         t0 + 0.0001 + s_lat, failed, None, None))
    return pd.DataFrame(
        rows,
        columns=["trace_id", "span_id", "parent_span_id", "kind", "service",
                 "start_ts", "end_ts", "failed", "db_system", "peer_service"],
    )


SPANS_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, kind string, "
    "service string, start_ts double, end_ts double, failed boolean, "
    "db_system string, peer_service string"
)


def spans_df(spark, n_pairs: int, seed: int = 42):
    # Explicit schema: peer_service is all-null in the generated frame and
    # schema inference fails on it under default session confs
    # (CANNOT_DETERMINE_TYPE) — never rely on inference for typed sources.
    return spark.createDataFrame(generate_spans(n_pairs, seed), schema=SPANS_SCHEMA)


# ---------------------------------------------------------------------------
# Oracle-checkable span stream: derived in-plan from the driver's `events`
# table with pure column expressions, so the service-graph queries
# (J1/A1/A8) are hash-checked against a DuckDB mirror of the SAME
# derivation instead of rows-only. Fully distributed — no driver-side
# generator, scales with the input.

import pyspark.sql.functions as F  # noqa: E402

SPAN_SERVICES = ["frontend", "checkout", "payments", "cart", "shipping", "auth"]


def spans_from_events(events):
    """Deterministic span pairs from events (SQL-expressible):

    - purchase & event_id%10<2  -> DB client-only span (postgres/redis)
    - click & event_id%5=0      -> unmatched client (joinless, dropped)
    - signup                    -> PRODUCER/CONSUMER async pair
    - everything else           -> CLIENT/SERVER sync pair
    - error rows set failed on client (id%2=0) / server (id%3=0)
    - latency = floor(value*10) % 2000 ms (floor: Spark cast truncates,
      DuckDB cast rounds — floor is exact IEEE in both engines)

    Resource-attr analogs for the topology exporter's AddConnection
    (service.namespace / service.instance.id / peer.service,
    ststopologyexporter/internal/topology.go:199-320), all deterministic
    so the DuckDB oracle mirrors them:
    - service_namespace:   client 'ns-'||user_id%2, server 'ns-'||(user_id+1)%2
    - service_instance_id: client set iff event_id%4=0, server iff
      event_id%3=0, else NULL (exercises the name-fallback branch)
    - peer_service: set on db/async CLIENT spans iff event_id%7=0
      (exercises FindDatabase's peer-wins naming, connector.go:721-744,
      and AddConnection's peer-target branches)
    """
    svc = F.array(*[F.lit(s) for s in SPAN_SERVICES])
    lat_ms = F.floor(F.col("value") * 10).cast("long") % 2000
    is_db = (F.col("event_type") == "purchase") & (F.col("event_id") % 10 < 2)
    is_unmatched = (F.col("event_type") == "click") & (F.col("event_id") % 5 == 0)
    is_async = F.col("event_type") == "signup"
    client_failed = (F.col("event_type") == "error") & (F.col("event_id") % 2 == 0)
    server_failed = (F.col("event_type") == "error") & (F.col("event_id") % 3 == 0)
    client_svc = F.element_at(svc, (F.col("user_id") % 6 + 1).cast("int"))
    server_svc = F.element_at(
        svc, ((F.col("user_id") + 1 + F.col("event_id") % 3) % 6 + 1).cast("int")
    )
    trace = F.col("event_id").cast("string")
    cspan = F.concat(F.lit("c-"), trace)
    peer = F.when(
        (is_db | is_async) & (F.col("event_id") % 7 == 0),
        F.concat(F.lit("peer-"), (F.col("event_id") % 3).cast("string")),
    ).cast("string")

    client = events.select(
        trace.alias("trace_id"),
        cspan.alias("span_id"),
        F.lit("").alias("parent_span_id"),
        F.when(is_async, "PRODUCER").otherwise("CLIENT").alias("kind"),
        client_svc.alias("service"),
        F.lit(0.0).alias("start_ts"),
        (lat_ms.cast("double") / 1000.0).alias("end_ts"),
        client_failed.alias("failed"),
        F.when(
            is_db,
            F.when(F.col("event_id") % 2 == 0, "postgres").otherwise("redis"),
        ).alias("db_system"),
        peer.alias("peer_service"),
        F.concat(F.lit("ns-"), (F.col("user_id") % 2).cast("string")).alias(
            "service_namespace"
        ),
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(client_svc, F.lit("-i"), (F.col("user_id") % 3).cast("string")),
        )
        .cast("string")
        .alias("service_instance_id"),
    )
    server = events.where(~is_db & ~is_unmatched).select(
        trace.alias("trace_id"),
        F.concat(F.lit("s-"), trace).alias("span_id"),
        cspan.alias("parent_span_id"),
        F.when(is_async, "CONSUMER").otherwise("SERVER").alias("kind"),
        server_svc.alias("service"),
        F.lit(0.0).alias("start_ts"),
        (lat_ms.cast("double") / 2000.0).alias("end_ts"),
        server_failed.alias("failed"),
        F.lit(None).cast("string").alias("db_system"),
        F.lit(None).cast("string").alias("peer_service"),
        F.concat(F.lit("ns-"), ((F.col("user_id") + 1) % 2).cast("string")).alias(
            "service_namespace"
        ),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(server_svc, F.lit("-i"), (F.col("user_id") % 2).cast("string")),
        )
        .cast("string")
        .alias("service_instance_id"),
    )
    return client.unionByName(server)
