"""File settings provider (S5) end-to-end: load a JSON snapshot, apply it,
diff against the defaults (v1 -> v2 removes page-host + archived-delete,
adds staging-host) — the settings-update lifecycle of SURVEY.md §3.2."""

from __future__ import annotations

import os

from sts_opentelemetry_collector_spark.operators.mapping import (
    apply_mappings,
    register_sql_functions,
)
from sts_opentelemetry_collector_spark.operators.parse import parse_pages, with_attrs
from sts_opentelemetry_collector_spark.sources.settings import (
    default_mappings,
    diff_settings,
    load_mapping_set,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "mappings_v2.json")


def test_load_and_apply_file_snapshot(spark, webtext):
    register_sql_functions(spark)
    ms = load_mapping_set(FIXTURE)
    assert ms.version == 2
    assert [m.identifier for m in ms.components] == ["page-service", "staging-host"]

    pages = with_attrs(parse_pages(webtext))
    out = apply_mappings(pages, ms, signal="logs")
    assert len(out.errors) == 0
    svc = out.components.where("data_source = 'page-service'")
    stg = out.components.where("data_source = 'staging-host'")
    assert svc.count() > 0 and stg.count() > 0
    assert stg.first().external_id.startswith("urn:webtext:host/")
    # regex tag round-trips through JSON config
    assert svc.first().tags["k8s.cluster"] == "production"


def test_snapshot_diff_v1_to_v2():
    removed = diff_settings(default_mappings(), load_mapping_set(FIXTURE))
    assert removed == ["archived-page-delete", "page-host"]


def test_snapshot_changed_deep_equality():
    """cache.go:129-182 analog: unchanged snapshots short-circuit; version
    bumps and content edits register as changes."""
    from sts_opentelemetry_collector_spark.sources.settings import (
        default_mappings,
        snapshot_changed,
    )

    a = default_mappings()
    b = default_mappings()  # distinct objects, same content
    assert snapshot_changed(None, a)
    assert not snapshot_changed(a, b)
    b.version += 1
    assert snapshot_changed(a, b)
    c = default_mappings()
    c.components = c.components[:-1]
    assert snapshot_changed(a, c)
