"""Property-based tests (hypothesis) for the pure-Python kernels —
no SparkSession needed, so these run anywhere instantly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
import pandas as pd

from sts_opentelemetry_collector_spark.functions.hashes import (
    fnv1a32_batch,
    fnv1a32_py,
)
from sts_opentelemetry_collector_spark.functions.text import (
    extract_text_bytes,
    parse_html_batch,
)


@given(st.lists(st.text(max_size=200), min_size=0, max_size=50))
@settings(max_examples=50, deadline=None)
def test_fnv_vectorized_equals_scalar(values):
    got = fnv1a32_batch(pd.Series(values, dtype=object)).tolist()
    assert got == [fnv1a32_py(v) for v in values]


@given(st.integers(min_value=0, max_value=0xFFFFFFFF))
@settings(max_examples=50, deadline=None)
def test_fnv_output_is_32bit(n):
    s = str(n)
    assert 0 <= fnv1a32_py(s) <= 0xFFFFFFFF


@given(st.text(alphabet=st.characters(blacklist_characters="<>", max_codepoint=0x2FFF), max_size=500))
@settings(max_examples=50, deadline=None)
def test_parse_roundtrip_byte_identical(payload):
    """Any payload embedded in the html template is extracted byte-identically."""
    html = f"<html><body><p>{payload}</p></body></html>".encode("utf-8")
    assert extract_text_bytes(html) == payload


@given(
    st.lists(
        st.text(alphabet=st.characters(blacklist_characters="<>", max_codepoint=0x2FFF), max_size=100),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=25, deadline=None)
def test_parse_batch_matches_scalar(payloads):
    htmls = [f"<html><body><p>{p}</p></body></html>".encode("utf-8") for p in payloads]
    out = parse_html_batch(pd.Series(htmls))
    assert out["text"].tolist() == payloads
