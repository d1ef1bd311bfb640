"""Parse-stage invariants: byte-identical extracted text per url
(BASELINE.json input_hint; mirrors the reference e2e golden assertions,
test/e2e/logtopology_test.go:353-412)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sts_opentelemetry_collector_spark.functions.text import extract_text_bytes
from sts_opentelemetry_collector_spark.operators.parse import parse_pages


def test_extract_text_pure_function():
    html = '<html lang="en"><head><title>t</title></head><body><p>hello world</p></body></html>'.encode()
    assert extract_text_bytes(html) == "hello world"
    assert extract_text_bytes(html) == extract_text_bytes(bytes(html))
    assert extract_text_bytes(b"<html></html>") == ""


def test_parse_byte_identical_all_rows(webtext):
    parsed = parse_pages(webtext)
    n = parsed.count()
    assert n == 2000
    mismatches = parsed.where(
        ~(F.col("extracted_text").eqNullSafe(F.col("expected_text")))
    ).count()
    assert mismatches == 0


def test_parse_attrs_extracted(webtext):
    parsed = parse_pages(webtext)
    row = parsed.orderBy("url").first()
    assert row.host.startswith("site")
    assert row.html_lang == row.lang
    assert row.service.startswith("svc-")
    assert row.cluster in ("production", "staging", "dev")
    nulls = parsed.where(F.col("service").isNull() | F.col("cluster").isNull()).count()
    assert nulls == 0
