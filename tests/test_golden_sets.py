"""Pinned golden element sets (FIXTURES.md §6): exact counts and external
ids for the deterministic 2000-row webtext fixture — the e2e
golden-component-set pattern (test/e2e/logtopology_test.go:353-412).
If the generator or mapping engine drifts, these pins catch it."""

from __future__ import annotations

import pytest

from sts_opentelemetry_collector_spark.operators.dedup import dedup_elements
from sts_opentelemetry_collector_spark.operators.mapping import (
    apply_mappings,
    register_sql_functions,
)
from sts_opentelemetry_collector_spark.operators.parse import parse_pages, with_attrs
from sts_opentelemetry_collector_spark.sources.settings import default_mappings


@pytest.fixture(scope="module")
def elements(spark, webtext):
    register_sql_functions(spark)
    pages = with_attrs(parse_pages(webtext))
    out = apply_mappings(pages, default_mappings())
    return (
        dedup_elements(out.components),
        dedup_elements(out.relations),
        dedup_elements(out.deletes),
    )


def test_golden_counts(elements):
    comps, rels, dels = elements
    assert comps.count() == 79  # 16 production services + 63 observed hosts
    assert rels.count() == 22
    assert dels.count() == 14


def test_golden_service_set(elements):
    comps, _, _ = elements
    svc = sorted(
        r.external_id for r in comps.where("data_source='page-service'").collect()
    )
    assert len(svc) == 16
    assert svc[0] == "urn:webtext:cluster/production:service/svc-00"
    assert svc[-1] == "urn:webtext:cluster/production:service/svc-15"
    assert comps.where("data_source='page-host'").count() == 63


def test_golden_relation_and_delete_sets(elements):
    _, rels, dels = elements
    rel_ids = sorted(r.external_id for r in rels.collect())
    assert (
        rel_ids[0]
        == "urn:webtext:cluster/production:service/svc-00-urn:webtext:host/site000.example.org"
    )
    del_ids = sorted(r.external_id for r in dels.collect())
    assert del_ids[:3] == [
        "urn:webtext:host/site002.example.org",
        "urn:webtext:host/site005.example.org",
        "urn:webtext:host/site008.example.org",
    ]


def test_dedup_suppression_on_identical_resend(elements, spark, webtext):
    """Re-running on identical input adds ZERO new elements
    (logtopology_test.go:35-62)."""
    comps, _, _ = elements
    pages = with_attrs(parse_pages(webtext))
    out2 = apply_mappings(pages, default_mappings())
    doubled = dedup_elements(out2.components.unionAll(out2.components))
    assert doubled.count() == comps.count()
