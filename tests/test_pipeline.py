"""End-to-end pipeline tests: per-sink routed-row counts, rollup equality,
lineage manifest, and kill/rerun resumability (BASELINE.md §B)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from sts_opentelemetry_collector_spark.plans.pipeline import run_pipeline
from sts_opentelemetry_collector_spark.plans.sinks import SinkCatalog
from sts_opentelemetry_collector_spark.sources.settings import default_mappings


def _webtext_path(webtext_dir):
    return os.path.join(webtext_dir, "webtext.parquet")


def test_full_run_counts(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "full")
    summary = run_pipeline(spark, _webtext_path(webtext_dir), out, n_lineage_buckets=8)
    assert summary["rows"] == 2000
    assert summary["parse_failures"] == 0
    sc = summary["sink_counts"]
    assert sc["otel_logs"] == 2000
    assert sc["topology_components"] > 0
    assert sc["topology_relations"] > 0
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    # per-sink routed-row equality: what the summary claims is what landed
    els = sinks.read(spark, "topology_elements")
    assert els.where("element_kind = 'component'").count() == sc["topology_components"]
    assert els.where("element_kind = 'relation'").count() == sc["topology_relations"]
    assert sinks.read(spark, "otel_logs").count() == 2000
    # rollup mass equals total pages
    rollup = sinks.read(spark, "rollup_host_window")
    assert rollup.agg(F.sum("page_count")).first()[0] == 2000
    # manifest: all 8 partitions recorded, row counts sum to total
    manifest = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    assert manifest.count() == 8
    assert manifest.agg(F.sum("row_count")).first()[0] == 2000
    # telemetry counters landed
    tel = sinks.read(spark, "telemetry")
    assert tel.where("metric = 'topology_produced_total'").count() > 0
    # K4 resources dim: one content-addressed row per distinct resource
    # identity, landed via the txlog MERGE; idempotent across re-MERGE
    res = sinks.read(spark, "otel_resources")
    n_identities = (
        sinks.read(spark, "otel_logs")
        .select("host", "service", "cluster", "namespace")
        .distinct()
        .count()
    )
    assert sc["otel_resources"] == res.count() == n_identities
    assert res.select("resource_ref").distinct().count() == n_identities


def test_resume_converges_to_full_run(spark, webtext_dir, tmp_path):
    out_full = str(tmp_path / "ref")
    out_resume = str(tmp_path / "resume")
    wt = _webtext_path(webtext_dir)

    full = run_pipeline(spark, wt, out_full, n_lineage_buckets=8)

    # simulate a killed run: only 3 of 8 partitions complete
    first = run_pipeline(spark, wt, out_resume, n_lineage_buckets=8, max_partitions_this_run=3)
    assert first["partitions_processed"] == 3
    second = run_pipeline(spark, wt, out_resume, n_lineage_buckets=8)
    assert second["partitions_processed"] == 5
    # third run: nothing pending
    third = run_pipeline(spark, wt, out_resume, n_lineage_buckets=8)
    assert third.get("skipped") is True

    sinks_full = SinkCatalog(os.path.join(out_full, "sinks"))
    sinks_res = SinkCatalog(os.path.join(out_resume, "sinks"))
    # logs: exact row equality
    assert (
        sinks_res.read(spark, "otel_logs").count()
        == sinks_full.read(spark, "otel_logs").count()
        == 2000
    )
    # rollup: identical (host, window) -> count maps
    a = {
        (r.host, r.window_start): r.page_count
        for r in sinks_full.read(spark, "rollup_host_window").collect()
    }
    b = {
        (r.host, r.window_start): r.page_count
        for r in sinks_res.read(spark, "rollup_host_window").collect()
    }
    assert a == b
    # topology elements: identical distinct element sets (delivery is
    # at-least-once across runs; identity equality is the invariant)
    for kind in ("component", "relation"):
        sa = {
            (r.data_source, r.external_id)
            for r in sinks_full.read(spark, "topology_elements")
            .where(f"element_kind = '{kind}'")
            .select("data_source", "external_id").collect()
        }
        sb = {
            (r.data_source, r.external_id)
            for r in sinks_res.read(spark, "topology_elements")
            .where(f"element_kind = '{kind}'")
            .select("data_source", "external_id").collect()
        }
        assert sa == sb


def test_incremental_second_batch(spark, webtext_dir, tmp_path):
    """A NEW ingest batch (different input path) must process fully —
    the manifest is input_split-scoped, not global (Iceberg incremental
    processing analog)."""
    from sts_opentelemetry_collector_spark.sources.webtext import write_webtext

    out = str(tmp_path / "incr")
    first = run_pipeline(spark, _webtext_path(webtext_dir), out, n_lineage_buckets=4)
    assert first["rows"] == 2000

    batch2_dir = str(tmp_path / "batch2")
    wt2 = write_webtext(batch2_dir, 500, seed=7)
    second = run_pipeline(spark, wt2, out, n_lineage_buckets=4)
    assert second.get("skipped") is not True
    assert second["rows"] == 500

    sinks = SinkCatalog(os.path.join(out, "sinks"))
    assert sinks.read(spark, "otel_logs").count() == 2500
    # rollup covers both batches
    rollup = sinks.read(spark, "rollup_host_window")
    assert rollup.agg(F.sum("page_count")).first()[0] == 2500
    # re-running either batch: nothing pending
    assert run_pipeline(spark, wt2, out, n_lineage_buckets=4).get("skipped") is True


def test_crashed_run_orphans_healed(spark, webtext_dir, tmp_path):
    """Both txlog crash shapes heal to exactly-once at the lineage-
    partition level: (A) a run that STAGED log files but crashed before
    publish leaves them invisible (vacuum reclaims); (B) a run that
    PUBLISHED its commit but crashed before the manifest recorded it is
    rolled back — metadata-only — at the next run's start."""
    import pyspark.sql.functions as F_

    out = str(tmp_path / "crash")
    wt = _webtext_path(webtext_dir)
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    crashed = spark.read.parquet(wt).limit(50).select(
        "url", "warc_ts", F_.lit(0).alias("lineage_partition")
    )
    # crash shape A: staged, never published
    staged = sinks.stage(crashed, "otel_logs")
    # crash shape B: published, but its run_id never reached the manifest
    sinks.append(crashed, "otel_logs",
                 meta={"run_id": "deadbeef0000", "input_split": wt})

    summary = run_pipeline(spark, wt, out, n_lineage_buckets=4)
    assert sinks.read(spark, "otel_logs").count() == summary["rows"] == 2000
    healed = [c for c in sinks.commits("otel_logs")
              if c.get("meta", {}).get("healed_run") == "deadbeef0000"]
    assert len(healed) == 1
    # the dead bytes (staged orphans + rolled-back commit) are vacuumable
    removed = set(sinks.vacuum("otel_logs", retain_seconds=0.0))
    assert set(staged.files) <= removed
    assert sinks.read(spark, "otel_logs").count() == 2000


def test_crashed_run_rollup_merge_healed(spark, webtext_dir, tmp_path):
    """The rollup sink is an ADDITIVE merge per run — a crashed run's
    merge (published, never manifested) must invert at the next start or
    the rerun double-counts its windows. Simulate: a full run, then a
    foreign run-tagged additive merge duplicating every row; heal must
    restore the exact pre-crash rollup."""
    import pyspark.sql.functions as F_

    out = str(tmp_path / "rollup_crash")
    wt = _webtext_path(webtext_dir)
    summary = run_pipeline(spark, wt, out, n_lineage_buckets=4)
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    good = sinks.read(spark, "rollup_host_window")
    good_mass = good.agg(F_.sum("page_count")).first()[0]
    assert good_mass == summary["rows"]

    # crashed run: its partials merged in, manifest never recorded it
    sinks.merge_aggregate(
        good.select("host", "window_start", "window_end", "page_count"),
        "rollup_host_window",
        keys=["host", "window_start", "window_end"],
        sum_cols=["page_count"],
        meta={"run_id": "deadbeefcafe", "input_split": wt},
    )
    doubled = sinks.read(spark, "rollup_host_window").agg(
        F_.sum("page_count")
    ).first()[0]
    assert doubled == 2 * good_mass

    from sts_opentelemetry_collector_spark.plans.lineage import Manifest
    from sts_opentelemetry_collector_spark.plans.pipeline import (
        _heal_unmanifested_runs,
    )

    manifest = Manifest(os.path.join(out, "manifest.parquet"))
    healed = _heal_unmanifested_runs(spark, sinks, manifest)
    assert "deadbeefcafe" in healed
    assert (
        sinks.read(spark, "rollup_host_window").agg(F_.sum("page_count")).first()[0]
        == good_mass
    )


def test_tombstones_on_mapping_removal(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "tomb")
    prev = default_mappings()
    cur = default_mappings()
    removed_id = cur.components.pop(1).identifier  # drop page-host mapping
    summary = run_pipeline(
        spark,
        _webtext_path(webtext_dir),
        out,
        mappings=cur,
        previous_mappings=prev,
        n_lineage_buckets=4,
    )
    assert summary["removed_mappings"] == [removed_id]
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    tombs = sinks.read(spark, "tombstones")
    assert tombs.count() == 4  # one per shard (R5)
    assert tombs.select("data_source").distinct().first()[0] == removed_id


def test_envelopes_streams_intake_metadata_sinks(spark, webtext_dir, tmp_path):
    """A6/R6/K6/metadata wiring: the flagship run lands envelope groups,
    first-seen streams, a per-key sorted intake, and the mapping-metadata
    snapshot."""
    out = str(tmp_path / "wired")
    summary = run_pipeline(
        spark, _webtext_path(webtext_dir), out, n_lineage_buckets=4,
        api_keys={"page-service": "key-prod"},
    )
    sc = summary["sink_counts"]
    sinks = SinkCatalog(os.path.join(out, "sinks"))

    # A6: every (data_source, shard) stream coalesced into >=1 envelope;
    # element mass preserved
    env = sinks.read(spark, "topology_envelopes")
    assert sc["topology_envelopes"] == env.count() > 0
    total_elements = env.agg(F.sum("element_count")).first()[0]
    assert total_elements == (
        sc["topology_components"] + sc["topology_relations"]
        + sc["topology_deletes"]
    )

    # R6: first run sees every stream as new; second run over the same
    # input sees none
    ks = sinks.read(spark, "known_streams")
    assert sc["new_streams"] == ks.count() > 0
    summary2 = run_pipeline(
        spark, _webtext_path(webtext_dir), out, n_lineage_buckets=4,
        api_keys={"page-service": "key-prod"},
    )
    assert summary2.get("skipped") or summary2["sink_counts"]["new_streams"] == 0

    # K6/A9: intake partitioned per api key, rows sorted by external_id
    # within each file (canonical POST-body order)
    intake_root = sinks.path("topology_intake")
    key_dirs = [d for d in os.listdir(intake_root) if d.startswith("api_key=")]
    assert "api_key=key-prod" in key_dirs and "api_key=default-key" in key_dirs
    import pyarrow.parquet as pq

    for kd in key_dirs:
        for f in os.listdir(os.path.join(intake_root, kd)):
            if not f.endswith(".parquet"):
                continue
            ids = pq.read_table(
                os.path.join(intake_root, kd, f), columns=["external_id"]
            )["external_id"].to_pylist()
            assert ids == sorted(ids), f"unsorted intake file {kd}/{f}"

    # metadata: one record per live mapping
    meta = sinks.read(spark, "stream_metadata")
    assert meta.count() == len(
        default_mappings().components + default_mappings().relations
    )


def test_metadata_tombstones_on_removal(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "meta_ts")
    prev = default_mappings()
    cur = default_mappings()
    removed_id = cur.components[-1].identifier
    cur.components = cur.components[:-1]
    summary = run_pipeline(
        spark, _webtext_path(webtext_dir), out,
        mappings=cur, previous_mappings=prev, n_lineage_buckets=4,
    )
    assert summary["sink_counts"]["metadata_tombstones"] == 1
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    ts = sinks.read(spark, "metadata_tombstones").collect()
    assert [r.data_source for r in ts] == [removed_id]


def test_record_errors_counted_via_observe(spark, webtext_dir, tmp_path):
    """A mapping whose required output evals null on some rows yields
    mapping_errors counts WITHOUT a separate branch-union re-execution
    (counts ride the element write via observe)."""
    from sts_opentelemetry_collector_spark.config import (
        ComponentMapping,
        ComponentOutput,
    )

    out = str(tmp_path / "errs")
    ms = default_mappings()
    # title is null for some parsed rows? use a condition-true mapping whose
    # identifier is null whenever attrs lacks 'nope'
    ms.components.append(
        ComponentMapping(
            identifier="null-ident-mapping",
            output=ComponentOutput(
                identifier="attrs['nope']", name="host", type_name="'t'"
            ),
        )
    )
    summary = run_pipeline(spark, _webtext_path(webtext_dir), out, mappings=ms,
                           n_lineage_buckets=4)
    sinks = SinkCatalog(os.path.join(out, "sinks"))
    errs = {r.data_source: r.error_count
            for r in sinks.read(spark, "mapping_errors").collect()}
    assert errs.get("null-ident-mapping") == 2000  # every row errors
    assert summary["sink_counts"]["mapping_errors"] == 1
