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


def run_pipeline_streaming(
    spark: SparkSession,
    webtext_path: str,
    out_root: str,
    mappings=None,
    max_files: int = 4,
) -> dict:
    """Always-on mode: the flagship parse -> enrich -> map -> dedup ->
    shard -> export pipeline as ONE Structured Streaming job.

    foreachBatch applies the EXACT batch operators to each micro-batch —
    the reference's Kafka consume loop (each poll = one batch through the
    connector pipeline); the checkpoint gives exactly-once per micro-batch
    on the file source. Cross-batch element dedup is the downstream
    upsert's job (same at-least-once contract as the batch pipeline's
    element sinks); the in-stream dedup twin is streaming_dedup
    (dropDuplicatesWithinWatermark).

    AvailableNow drains the backlog then stops, so tests/CI can assert
    stream == batch; drop the trigger for a true always-on deployment.

    After the drain, the SAME publisher stage as the batch pipeline
    (publish_element_stream) runs over the landed element sink: envelopes
    (A6), stream lifecycle (R6), and the per-API-key intake (K6) — so
    every sink family exists in both modes with identical semantics and
    the summary carries per-sink counts for the parity check. (The
    reference publisher likewise runs over the consumed element store,
    not per Kafka poll.)
    """
    import os

    from ..operators.enrich import enrich_pages
    from ..operators.mapping import apply_mappings, register_sql_functions
    from ..operators.parse import ATTRS_SOURCE_COLS, parse_pages, with_attrs
    from ..plans.pipeline import build_element_stream, publish_element_stream
    from ..plans.sinks import SinkCatalog
    from ..session import ensure_semantics_confs
    from ..sources.settings import default_mappings
    from ..sources.webtext import dims

    ensure_semantics_confs(spark)
    register_sql_functions(spark)
    mappings = mappings or default_mappings()
    sinks = SinkCatalog(os.path.join(out_root, "sinks"))
    lang_map, host_topology = dims(spark)
    batches: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pages = parse_pages(batch_df.drop("text"))
        enriched = enrich_pages(pages, lang_map, host_topology)
        logs = enriched.select(
            "url", "warc_ts", "host", "path", "title", "extracted_text",
            "lang", "lang_family", "service", "cluster", "namespace",
        ).withColumn("ds", F.to_date("warc_ts"))
        # stage -> read-back -> publish, like the batch flagship: the
        # pandas-UDF parse runs ONCE per micro-batch (the mapping input
        # reads the staged columnar files, not the UDF subtree again)
        pending = sinks.stage(logs, "otel_logs_stream")
        logs_back = pending.read(spark)

        mi = with_attrs(
            logs_back.select("host", "path", "service", "cluster", "namespace", "lang")
        )
        compiled = apply_mappings(
            mi, mappings, signal="logs", attr_cols=ATTRS_SOURCE_COLS
        )
        elements = build_element_stream(
            compiled.components, compiled.relations, compiled.deletes
        )
        sinks.append(
            elements, "topology_elements_stream",
            partition_by=["data_source", "shard_id"],
        )
        # incremental rollup twin: this micro-batch's partials SUM into
        # the (host, window) rollup. foreachBatch redelivers a batch
        # after a crash and the additive merge is NOT idempotent, so the
        # commit is tagged with batch_id and skipped on redelivery — the
        # Delta txnAppId/txnVersion exactly-once pattern for foreachBatch.
        from ..operators.aggregate import windowed_rollup

        already = any(
            c.get("meta", {}).get("batch_id") == batch_id
            for c in sinks.commits("rollup_host_window_stream")
        ) if sinks.exists("rollup_host_window_stream") else False
        if not already:
            partial = windowed_rollup(
                logs_back, ts_col="warc_ts", keys=["host"],
                window="1 hour", salt_skew=True,
            )
            sinks.merge_aggregate(
                partial.select(
                    "host", "window_start", "window_end",
                    F.col("page_count").cast("long").alias("page_count"),
                ),
                "rollup_host_window_stream",
                keys=["host", "window_start", "window_end"],
                sum_cols=["page_count"],
                meta={"batch_id": batch_id},
            )
        pending.publish()
        batches.append(batch_id)

    stream = read_webtext_stream(spark, webtext_path, max_files=max_files)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # maintenance: each micro-batch landed one commit of small files;
    # bin-pack them before the read-back passes (OPTIMIZE — counts are
    # unaffected, pre-compaction snapshots stay time-travelable)
    for stream_sink in ("otel_logs_stream", "topology_elements_stream"):
        if sinks.exists(stream_sink):
            sinks.compact(spark, stream_sink)

    sink_counts = {"otel_logs": sinks.read(spark, "otel_logs_stream").count()}
    # K4 resources dim MERGE off the landed log store — shared helper
    # with the batch flagship (resource identity cannot drift)
    from ..plans.pipeline import upsert_resources

    sink_counts["otel_resources"] = upsert_resources(
        spark, sinks, sinks.read(spark, "otel_logs_stream")
    )
    if sinks.exists("topology_elements_stream"):
        el = sinks.read(spark, "topology_elements_stream")
        distinct = el.select(
            "element_kind", "data_source", "shard_id", "external_id"
        ).distinct()
        kinds = {
            r.element_kind: r.n
            for r in distinct.groupBy("element_kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sink_counts["topology_elements"] = sum(kinds.values())
        sink_counts["topology_components"] = kinds.get("component", 0)
        sink_counts["topology_relations"] = kinds.get("relation", 0)
        sink_counts["topology_deletes"] = kinds.get("delete", 0)
        sink_counts.update(
            publish_element_stream(
                spark, sinks, collection_ts=f"stream-{len(batches)}",
                elements_sink="topology_elements_stream",
            )
        )
    return {"micro_batches": len(batches), "sink_counts": sink_counts}


def run_settings_stream(
    spark: SparkSession,
    snapshots_dir: str,
    out_root: str,
    initial=None,
) -> dict:
    """S4 streaming twin: the settings-snapshot consumer loop.

    The reference subscribes to a compacted settings topic; every received
    snapshot triggers DiffSettings + listener notification (metadata
    publish, tombstones for removed mappings) gated by the change check
    (snapshot_manager.go:156-214, cache.go:129-182). Here a file stream
    watches a snapshots directory: each micro-batch applies arriving
    snapshot JSONs in filename order, short-circuits unchanged ones, and
    appends metadata records + tombstones exactly like the batch pipeline.

    Returns {applied, skipped_unchanged, skipped_stale, parse_errors,
    removed_total}.
    """
    import json as _json
    import os

    from ..operators.metadata import metadata_tombstones, stream_metadata
    from ..operators.routing import removal_tombstones
    from ..plans.sinks import SinkCatalog
    from ..sources.settings import (
        diff_settings,
        mapping_set_from_dict,
        snapshot_changed,
    )

    sinks = SinkCatalog(os.path.join(out_root, "sinks"))
    # restart recovery: the last applied snapshot persists next to the
    # checkpoint (the consumer-group position analog) so a restarted
    # watcher keeps diffing against what it last applied
    last_path = os.path.join(out_root, "last_snapshot.json")
    if initial is None and os.path.exists(last_path):
        with open(last_path) as f:
            initial = mapping_set_from_dict(_json.load(f))
    state = {"prev": initial, "applied": 0, "unchanged": 0, "stale": 0,
             "bad": 0, "removed": 0}

    raw = (
        spark.readStream.format("text")
        .option("wholetext", True)
        .option("maxFilesPerTrigger", 1)
        .load(snapshots_dir)
        .selectExpr("value", "_metadata.file_path AS file_path")
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # a malformed/half-written snapshot must not wedge the stream: the
        # reference consumer drops bad messages and keeps consuming.
        # Snapshots are small config documents — the collect() is bounded
        # explicitly (a malformed giant file is dropped like bad JSON, it
        # must not OOM the driver).
        max_snapshot_bytes = 64 * 1024 * 1024
        sized = batch_df.where(F.octet_length("value") <= max_snapshot_bytes)
        state["bad"] += batch_df.count() - sized.count()
        parsed = []
        for r in sized.collect():
            try:
                parsed.append((mapping_set_from_dict(_json.loads(r.value)), r.value))
            except Exception:
                state["bad"] += 1
        # apply in VERSION order (the topic guarantees order; the file
        # source does not — lexicographic paths put snap_10 before snap_2)
        parsed.sort(key=lambda t: t[0].version)
        for ms, raw_doc in parsed:
            # version gate (cache.go:129-182): stale re-deliveries (older
            # version than the applied snapshot) are dropped
            if state["prev"] is not None and ms.version < state["prev"].version:
                state["stale"] += 1
                continue
            if not snapshot_changed(state["prev"], ms):
                state["unchanged"] += 1
                continue
            removed = (
                diff_settings(state["prev"], ms) if state["prev"] is not None else []
            )
            sinks.overwrite(stream_metadata(spark, ms), "stream_metadata",
                            partition_by=None)
            if removed:
                # version-scoped partition overwrite => re-applying the
                # same snapshot after a crash (sink landed,
                # last_snapshot.json did not) is idempotent, never
                # doubling tombstone rows — one atomic txlog commit per
                # version partition
                vdir = f"version={ms.version}"
                sinks.overwrite_partition(
                    removal_tombstones(spark, removed), "tombstones", vdir
                )
                sinks.overwrite_partition(
                    metadata_tombstones(spark, removed), "metadata_tombstones",
                    vdir,
                )
                state["removed"] += len(removed)
            state["prev"] = ms
            state["applied"] += 1
            os.makedirs(out_root, exist_ok=True)
            with open(last_path, "w") as f:
                f.write(raw_doc)

    q = (
        raw.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        "applied": state["applied"],
        "skipped_unchanged": state["unchanged"],
        "skipped_stale": state["stale"],
        "parse_errors": state["bad"],
        "removed_total": state["removed"],
    }


DOCS_SCHEMA = "doc_id long, text string, lang string"


def run_incremental_dedup_stream(
    spark: SparkSession,
    docs_path: str,
    out_root: str,
    n: int = 2,
    threshold: float = 0.5,
    bands: int = 4,
) -> None:
    """Streaming twin of incremental_near_dup: each micro-batch of
    arriving docs dedups against the ACCUMULATED corpus band index, then
    appends its own index rows and text — the always-on ingest-dedup loop
    of a growing 10^12-doc corpus.

    foreachBatch (not a stream-static join operator) because the static
    side MUTATES per trigger: the index/doc stores grow with every batch,
    and the candidate join + the three appends form one unit of work per
    trigger (an Iceberg transaction in production; parquet-dir appends
    here). Completeness is order-independent — every cross-batch pair is
    found exactly once, when its LATER batch arrives — pinned by
    test_streaming_incremental_dedup_equals_batch.

    Sinks under out_root: near_dup_pairs/ (new_doc_id, dup_of, jaccard),
    lsh_index/ (doc_id, band, bucket), docs_store/ (doc_id, text).
    """
    import os

    from ..operators.textops import (
        incremental_near_dup_with_index,
        lsh_band_index,
    )

    idx_path = os.path.join(out_root, "lsh_index")
    docs_store = os.path.join(out_root, "docs_store")
    pairs_path = os.path.join(out_root, "near_dup_pairs")

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        # every frame persisted for this batch lands in `caches` and is
        # released after the three writes — an always-on stream must not
        # accumulate cached frames across triggers (ADVICE r3)
        batch = batch_df.select("doc_id", "text").persist()
        caches = [batch]
        if os.path.isdir(idx_path):
            corpus_idx = spark.read.parquet(idx_path)
            corpus_docs = spark.read.parquet(docs_store)
        else:  # first batch: empty corpus, within-batch pairs only
            corpus_idx = spark.createDataFrame(
                [], "doc_id long, band int, bucket string"
            )
            corpus_docs = spark.createDataFrame([], "doc_id long, text string")
        pairs = incremental_near_dup_with_index(
            batch, corpus_docs, corpus_idx, n=n, threshold=threshold, bands=bands,
            cache_registry=caches,
        )
        pairs.write.mode("append").parquet(pairs_path)
        lsh_band_index(batch, bands=bands, n=n).write.mode("append").parquet(idx_path)
        batch.write.mode("append").parquet(docs_store)
        for c in caches:
            c.unpersist()

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_path)
        .writeStream.foreachBatch(_handle)
        .option("checkpointLocation", os.path.join(out_root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
