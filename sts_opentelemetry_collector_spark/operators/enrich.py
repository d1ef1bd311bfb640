"""Broadcast-join enrichment (SURVEY.md J2/J3).

The reference "joins" every record against the current settings snapshot
(connector.go:101-127) and denormalizes resource attributes into topology
components (ststopologyexporter/internal/topology.go:110-198). The Spark
shape is an explicit broadcast hash join against small dimension tables —
no shuffle of the 100 TB fact side, dimension replicated to executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def enrich_pages(
    pages: DataFrame, lang_map: DataFrame, host_topology: DataFrame
) -> DataFrame:
    """pages × lang_map (on lang) × host_topology (on host), both broadcast.

    host_topology carries the authoritative cluster/namespace/service for a
    host; the html-extracted attrs are the per-record claim. Enriched
    columns are prefixed dim_ to keep provenance explicit.
    """
    lm = broadcast(lang_map.select("lang", "lang_family", "lang_name"))
    ht = broadcast(
        host_topology.select(
            F.col("host"),
            F.col("cluster").alias("dim_cluster"),
            F.col("namespace").alias("dim_namespace"),
            F.col("service").alias("dim_service"),
            F.col("layer").alias("dim_layer"),
        )
    )
    return pages.join(lm, on="lang", how="left").join(ht, on="host", how="left")
