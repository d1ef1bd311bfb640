"""Custom stateful streaming operator: the service-graph edge store as
applyInPandasWithState.

The reference's store (stsservicegraphconnector/internal/store/store.go:
91-129) is a TTL'd hash map keyed (trace_id, join_key): the first side of
a client/server pair inserts, the second completes and emits; singles are
evicted after the TTL. The stream-stream join in jobs.py is the
declarative form; this operator is the imperative form for semantics the
join can't express (capacity bounds, eviction counters — the reference's
ErrTooManyItems path, connector.go:253-343).

State per group key (trace_id, join_key): the pending side's fields.
Timeout: EVENT-time TTL — the watermark advancing past pending_ts + TTL
expires a single, which emits an `expired` marker row (the reference
increments an eviction counter; we emit an auditable row instead).
Event-time (not processing-time) timeouts keep the operator deterministic
and let Trigger.AvailableNow terminate: the final watermark fires all
expirable state in the last batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = (
    "trace_id string, join_key string, client string, server string, "
    "client_latency_sec double, server_latency_sec double, failed boolean, "
    "status string"
)

STATE_SCHEMA = (
    "side string, service string, latency double, failed boolean"
)

TTL_MS = 60_000


def edge_store_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Group = (trace_id, join_key). Emits a completed edge when both sides
    have arrived; emits an `expired` row when the TTL fires on a single."""
    trace_id, join_key = key

    if state.hasTimedOut:
        (side, service, latency, failed) = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "trace_id": trace_id,
                    "join_key": join_key,
                    "client": service if side == "client" else None,
                    "server": service if side == "server" else None,
                    "client_latency_sec": latency if side == "client" else None,
                    "server_latency_sec": latency if side == "server" else None,
                    "failed": bool(failed),
                    "status": "expired",
                }
            ]
        )
        return

    pending = state.get if state.exists else None
    out = []
    max_event_ms = None
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            side = "client" if row.kind in ("CLIENT", "PRODUCER") else "server"
            lat = float(row.end_ts - row.start_ts)
            ev_ms = int(row.event_ts.timestamp() * 1000)
            max_event_ms = ev_ms if max_event_ms is None else max(max_event_ms, ev_ms)
            if pending is None:
                pending = (side, row.service, lat, bool(row.failed))
            elif pending[0] != side:
                # edge completes (store.go upsert-complete path)
                c = (row.service, lat, bool(row.failed)) if side == "client" else (
                    pending[1], pending[2], pending[3]
                )
                s = (row.service, lat, bool(row.failed)) if side == "server" else (
                    pending[1], pending[2], pending[3]
                )
                out.append(
                    {
                        "trace_id": trace_id,
                        "join_key": join_key,
                        "client": c[0],
                        "server": s[0],
                        "client_latency_sec": c[1],
                        "server_latency_sec": s[1],
                        "failed": c[2] or s[2],
                        "status": "complete",
                    }
                )
                pending = None
            # same side twice: keep first (store.go keeps existing entry)

    if pending is not None:
        state.update(pending)
        # store TTL on event time (config-driven in the reference)
        state.setTimeoutTimestamp((max_event_ms or 0) + TTL_MS)
    elif state.exists:
        state.remove()

    if out:
        yield pd.DataFrame(out)


def streaming_edge_store(spans):
    """spans stream -> completed/expired edges via the stateful store.

    spans columns: trace_id, span_id, parent_span_id, kind, service,
    start_ts, end_ts (doubles), failed.
    """
    import pyspark.sql.functions as F

    spans = spans.withColumn(
        "event_ts", F.timestamp_seconds(F.col("end_ts"))
    ).withWatermark("event_ts", "10 seconds")
    keyed = spans.withColumn(
        "join_key",
        F.when(F.col("kind").isin("CLIENT", "PRODUCER"), F.col("span_id")).otherwise(
            F.col("parent_span_id")
        ),
    )
    return keyed.groupBy("trace_id", "join_key").applyInPandasWithState(
        edge_store_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
