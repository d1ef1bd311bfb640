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


def spans_df(spark, n_pairs: int, seed: int = 42):
    return spark.createDataFrame(generate_spans(n_pairs, seed))
