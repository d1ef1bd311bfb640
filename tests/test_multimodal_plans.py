"""Multimodal plumbing tests + physical-plan quality assertions
(pushdown / broadcast / codegen — the .explain() gate from the brief)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sts_opentelemetry_collector_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_stub,
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_decode_stub_deterministic():
    a = decode_stub(b"abc", "image")
    b = decode_stub(b"abc", "image")
    assert (a == b).all()
    assert len(a) == FEATURE_DIM
    assert (decode_stub(b"xyz", "image") != a).any()


def test_extract_features_schema_and_values(spark):
    media = synth_media(spark, 99)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 99
    r = rows[0]
    assert len(r.features) == FEATURE_DIM
    assert r.n_bytes > 0
    # deterministic across runs
    again = {x.url: x.features for x in extract_features(media).collect()}
    assert again[r.url] == r.features
    # payload projected away: output schema is narrow
    assert "payload" not in feats.columns


def test_frame_sample_plan(spark):
    media = synth_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000)
    got = frames.groupBy("url").count().collect()
    # every video is 3000ms -> 3 frames
    assert all(r["count"] == 3 for r in got)
    assert frames.where("frame_ts_ms not in (0, 1000, 2000)").count() == 0


# ---------------------------------------------------------------------------
# physical-plan quality gates


def test_filter_pushdown_reaches_scan(spark, webtext_dir):
    import os

    df = spark.read.parquet(os.path.join(webtext_dir, "webtext.parquet"))
    plan = (
        df.where(F.col("lang") == "en")
        .select("url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: scan must not read html/text
    assert "html" not in plan.split("ReadSchema")[1][:200]


def test_broadcast_join_chosen_for_dims(spark, webtext):
    from sts_opentelemetry_collector_spark.operators.enrich import enrich_pages
    from sts_opentelemetry_collector_spark.operators.parse import parse_pages
    from sts_opentelemetry_collector_spark.sources.webtext import dims

    lm, ht = dims(spark)
    out = enrich_pages(parse_pages(webtext), lm, ht)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregation_is_partial_then_final(spark, webtext):
    # map-side combine: two HashAggregate levels around the shuffle
    agg = webtext.groupBy("lang").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(lang" in plan


def test_whole_stage_codegen_covers_mapping(spark, webtext):
    from sts_opentelemetry_collector_spark.operators.mapping import (
        apply_mappings,
        register_sql_functions,
    )
    from sts_opentelemetry_collector_spark.operators.parse import parse_pages, with_attrs
    from sts_opentelemetry_collector_spark.sources.settings import default_mappings

    import contextlib
    import io

    spark.catalog.clearCache()  # a cached identical subtree (other test
    # modules) would swap the scan for InMemoryTableScan and hide codegen
    register_sql_functions(spark)
    pages = with_attrs(parse_pages(webtext))
    out = apply_mappings(pages, default_mappings())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.components.explain("formatted")
    plan = buf.getvalue()
    assert "codegen id" in plan  # whole-stage codegen spans present
    # plan-level witness that Catalyst prunes the parse UDF out of branches
    # whose mapping never references parsed fields: the page-host branch
    # reads only (url, lang) straight from the scan
    assert "ReadSchema: struct<url:string,lang:string>" in plan
