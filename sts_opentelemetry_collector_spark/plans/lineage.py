"""Per-partition lineage manifest + resumability (north rule requirement).

The reference's analog is its internal telemetry (counters per mapping/
signal, metrics/metrics.go:58-150) plus Kafka's at-least-once offsets. In a
batch job over an Iceberg/parquet table, resumability means: deterministic
input partitioning + a manifest of completed partitions + anti-join on
rerun. Idempotence comes from writing each partition's outputs under a
partition-scoped directory (overwrite-by-partition), so a rerun of a
half-finished run never double-counts.

Partitioning: lineage_partition = pmod(xxhash64(url), n_buckets). Purely a
function of the data — stable across runs, cluster sizes, and input
splits (unlike file-based split ids). n_buckets scales with input size
(default 32 here; thousands at 100 TB so one bucket ≪ executor memory).
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "run_id string, lineage_partition int, input_split string, row_count long, "
    "parse_failures long, completed_at timestamp"
)


def with_lineage_partition(df: DataFrame, key_col: str = "url", n_buckets: int = 32) -> DataFrame:
    return df.withColumn(
        "lineage_partition", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


class Manifest:
    """Parquet-backed manifest table (Iceberg in production)."""

    def __init__(self, path: str):
        self.path = path

    def completed_partitions(
        self, spark: SparkSession, input_split: str | None = None
    ) -> set[int]:
        """Completed partitions, scoped to one input batch when given —
        a NEW ingest batch (different input path) starts with a clean
        pending set instead of being skipped (Iceberg analog: incremental
        processing per snapshot)."""
        if not os.path.exists(self.path):
            return set()
        df = spark.read.parquet(self.path)
        if input_split is not None:
            import pyspark.sql.functions as F

            df = df.where(F.col("input_split") == input_split)
        return {r.lineage_partition for r in df.select("lineage_partition").distinct().collect()}

    def run_ids(self, spark: SparkSession) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        df = spark.read.parquet(self.path)
        return {r.run_id for r in df.select("run_id").distinct().collect()}

    def record(self, spark: SparkSession, rows: list[dict]) -> None:
        if not rows:
            return
        df = spark.createDataFrame(
            [
                (
                    r["run_id"],
                    int(r["lineage_partition"]),
                    r.get("input_split", ""),
                    int(r["row_count"]),
                    int(r.get("parse_failures", 0)),
                )
                for r in rows
            ],
            "run_id string, lineage_partition int, input_split string, row_count long, parse_failures long",
        ).withColumn("completed_at", F.current_timestamp())
        # driver-built config-scale frame: repartition(1) => one file per
        # record() instead of defaultParallelism. (NB repartition, NOT
        # coalesce: coalesce(1) on a local relation drops the
        # LocalTableScan fast path and stalls ~6s/write — measured.)
        df.repartition(1).write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def pending_partitions(
    spark: SparkSession, manifest: Manifest, n_buckets: int
) -> list[int]:
    done = manifest.completed_partitions(spark)
    return [p for p in range(n_buckets) if p not in done]


def partition_stats(pages: DataFrame) -> DataFrame:
    """Per-partition metrics (A11 analog): row counts + parse failures,
    computed in the same pass via groupBy on the lineage partition."""
    return pages.groupBy("lineage_partition").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(
            F.when(F.col("extracted_text").isNull() | (F.col("extracted_text") == ""), 1).otherwise(0)
        ).alias("parse_failures"),
    )


def save_summary(path: str, summary: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)
