"""Vectorized text functions: the grok/regex parse stage plus the
training-data text-analysis suite (language-ID, quality scoring, token
counting, fingerprinting).

The parse is the Spark analog of the reference's OTLP receivers decoding
protobuf into attribute trees (connector/topologyconnector/internal/
signal_traverser.go:133-211): bytes in, typed record out. It MUST be a pure
function of the `html` bytes — byte-identical extracted text per url is the
pytest invariant (BASELINE.json input_hint).

Everything here is Arrow-vectorized (pandas UDF); no per-row Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd

# Grok-style patterns over the html byte stream. Compiled once per task
# (the reference LRU-caches compiled regexes — mapping.go:19-32; a module
# constant is the Spark equivalent: compile-once at import).
_P_TEXT = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_P_TITLE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_P_LANG = re.compile(rb'<html lang="([^"]*)"')
_P_META = re.compile(rb'<meta name="sts:service" content="([^"]*)"')
_P_K8S = re.compile(rb'data-k8s="cluster=([^;"]*);namespace=([^;"]*)"')

# fast path: one combined match against the canonical page template (5x
# fewer regex scans per row); any page that deviates falls back to the
# per-field patterns above, so semantics are unchanged
_P_ALL = re.compile(
    rb'<html lang="([^"]*)"><head><title>(.*?)</title>'
    rb'<meta name="sts:service" content="([^"]*)"></head>'
    rb"<body><p>(.*?)</p>"
    rb'<span data-k8s="cluster=([^;"]*);namespace=([^;"]*)"',
    re.DOTALL,
)


def extract_text_bytes(html: bytes) -> str:
    """Byte-identical text extraction: the exact payload between <p>..</p>.

    Decodes utf-8 strictly (no normalization, no locale dependence) so the
    result is a pure function of the input bytes.
    """
    if html is None:
        return None
    m = _P_TEXT.search(html)
    return m.group(1).decode("utf-8") if m else ""


def parse_html_batch(html: pd.Series) -> pd.DataFrame:
    """Vectorized parse of a batch of html byte strings.

    Returns columns: text, title, html_lang, service, cluster, namespace.
    Parse failures (missing markers) yield nulls, counted downstream as
    parse_failures in the lineage manifest (SURVEY.md A11).
    """
    n = len(html)
    out = {
        "text": [None] * n,
        "title": [None] * n,
        "html_lang": [None] * n,
        "service": [None] * n,
        "cluster": [None] * n,
        "namespace": [None] * n,
    }
    vals = html.to_numpy()
    for i in range(n):
        b = vals[i]
        if b is None:
            continue
        b = bytes(b)
        m = _P_ALL.match(b)
        if m:
            out["html_lang"][i] = m.group(1).decode("utf-8")
            out["title"][i] = m.group(2).decode("utf-8")
            out["service"][i] = m.group(3).decode("utf-8")
            out["text"][i] = m.group(4).decode("utf-8")
            out["cluster"][i] = m.group(5).decode("utf-8")
            out["namespace"][i] = m.group(6).decode("utf-8")
            continue
        m = _P_TEXT.search(b)
        if m:
            out["text"][i] = m.group(1).decode("utf-8")
        m = _P_TITLE.search(b)
        if m:
            out["title"][i] = m.group(1).decode("utf-8")
        m = _P_LANG.search(b)
        if m:
            out["html_lang"][i] = m.group(1).decode("utf-8")
        m = _P_META.search(b)
        if m:
            out["service"][i] = m.group(1).decode("utf-8")
        m = _P_K8S.search(b)
        if m:
            out["cluster"][i] = m.group(1).decode("utf-8")
            out["namespace"][i] = m.group(2).decode("utf-8")
    return pd.DataFrame(out)
