"""Sink layer: the exporter fan-out, parquet-backed.

The reference fans one stream out to Kafka (keyed records, topic override,
tombstones — exporter/stskafkaexporter/exporter.go), ClickHouse (typed
tables — exporter/clickhousestsexporter), and an HTTP topology intake
(exporter/ststopologyexporter). Here every sink is a table directory; the
production target is Iceberg (`df.writeTo(...).append()`), but this
container ships no Iceberg runtime, so sinks write partitioned parquet
through the same narrow interface — swap `format` on a real cluster.

Scale notes:
- Writes are partitioned by (data_source, shard_id) — the Kafka partition
  key (message_builder.go:21-52) — so one sink partition == one ordered
  stream, and downstream consumers prune by data_source.
- Input is repartitioned on the same keys before the write: files land
  pre-clustered, no tiny-file explosion at 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SinkCatalog:
    """Named sink tables under a root directory."""

    def __init__(self, root: str, fmt: str = "parquet"):
        self.root = root
        self.fmt = fmt

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.write.format(self.fmt).mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))

    def overwrite(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.write.format(self.fmt).mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self.path(name))

    def upsert(
        self,
        df: DataFrame,
        name: str,
        keys: list[str],
        order_col: str | None = None,
    ) -> None:
        """Last-writer-wins upsert keyed `keys` — the ClickHouse
        ReplacingMergeTree / Iceberg MERGE INTO analog (K4 resources dim,
        exporter_resources.go:141-144). Parquet backend: read existing ∪
        new, keep the newest row per key, atomic swap via staging dir.
        On Iceberg this is a real MERGE — no table rewrite."""
        import shutil
        import uuid

        import pyspark.sql.functions as F
        from pyspark.sql import Window

        spark = df.sparkSession
        target = self.path(name)
        if self.exists(name):
            existing = self.read(spark, name)
            merged = existing.withColumn("_gen", F.lit(0)).unionByName(
                df.withColumn("_gen", F.lit(1))
            )
        else:
            merged = df.withColumn("_gen", F.lit(1))
        order = [F.col("_gen").desc()] + (
            [F.col(order_col).desc()] if order_col else []
        )
        w = Window.partitionBy(*keys).orderBy(*order)
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        staging = f"{target}__stage_{uuid.uuid4().hex[:8]}"
        latest.write.format(self.fmt).mode("overwrite").save(staging)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(staging, target)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.exists(p) and any(
            f.endswith(".parquet") or f.startswith(("data_source=", "part-"))
            for f in os.listdir(p)
        )
