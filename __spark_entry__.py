"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship parse->map->dedup->shard->aggregate pipeline over a
webtext table synthesized deterministically (in-plan, no external data)
from the driver's sf0.001 `documents` table.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 plus the training-data ops — catalog lives in
sts_opentelemetry_collector_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from sts_opentelemetry_collector_spark import entry_queries  # noqa: E402
from sts_opentelemetry_collector_spark.operators.dedup import dedup_elements  # noqa: E402
from sts_opentelemetry_collector_spark.operators.mapping import (  # noqa: E402
    apply_mappings,
    register_sql_functions,
)
from sts_opentelemetry_collector_spark.operators.parse import (  # noqa: E402
    parse_pages,
    with_attrs,
)
from sts_opentelemetry_collector_spark.operators.routing import with_shard_id  # noqa: E402
from sts_opentelemetry_collector_spark.sources.settings import default_mappings  # noqa: E402


def synth_webtext_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministically wrap `documents` rows into the webtext envelope
    (url, warc_ts, html:binary, text, lang) — the flagship input shape
    (BASELINE.json input_hint), derived in-plan from driver data."""
    cluster = F.element_at(
        F.array(F.lit("production"), F.lit("staging"), F.lit("dev")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    svc = F.concat(F.lit("svc-"), F.lpad((F.col("doc_id") % 16).cast("string"), 2, "0"))
    ns = F.concat(F.lit("ns-"), (F.col("doc_id") % 4).cast("string"))
    host = F.concat(F.lit("site"), F.lpad((F.col("doc_id") % 64).cast("string"), 3, "0"),
                    F.lit(".example.org"))
    url = F.concat(F.lit("https://"), host, F.lit("/docs/"), F.col("doc_id").cast("string"))
    warc_ts = F.to_timestamp(F.lit("2024-03-01 00:00:00")) + F.make_interval(
        secs=F.col("doc_id").cast("double")
    )
    html = F.encode(
        F.concat(
            F.lit('<html lang="'), F.col("lang"), F.lit('"><head><title>doc-'),
            F.col("doc_id").cast("string"), F.lit('</title><meta name="sts:service" content="'),
            svc, F.lit('"></head><body><p>'), F.col("text"), F.lit("</p>"),
            F.lit('<span data-k8s="cluster='), cluster, F.lit(";namespace="), ns,
            F.lit('"></span></body></html>'),
        ),
        "utf-8",
    )
    return docs.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _ensure_session_confs(spark: SparkSession) -> None:
    """The driver supplies its own session: set the runtime-settable confs
    the mapping engine's semantics depend on (eval-error => condition
    false; explicit tag keys override regex-derived ones)."""
    from sts_opentelemetry_collector_spark.session import ensure_semantics_confs

    ensure_semantics_confs(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_session_confs(spark)
    register_sql_functions(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    webtext = synth_webtext_from_documents(docs)
    pages = with_attrs(parse_pages(webtext))
    from sts_opentelemetry_collector_spark.operators.parse import ATTRS_SOURCE_COLS

    compiled = apply_mappings(
        pages, default_mappings(), signal="logs", attr_cols=ATTRS_SOURCE_COLS
    )
    components = with_shard_id(dedup_elements(compiled.components))
    return (
        components.groupBy("data_source", "type_name", "shard_id")
        .agg(F.count(F.lit(1)).alias("component_count"))
        .orderBy("data_source", "type_name", "shard_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return dict(entry_queries.ORACLES)
