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
        df = spark.read.format(self.fmt).load(self.path(name))
        # _bucket is upsert-internal layout, not table schema
        return df.drop("_bucket") if "_bucket" in df.columns else df

    def upsert(
        self,
        df: DataFrame,
        name: str,
        keys: list[str],
        order_col: str | None = None,
        n_buckets: int = 16,
    ) -> None:
        """Last-writer-wins upsert keyed `keys` — the ClickHouse
        ReplacingMergeTree / Iceberg MERGE INTO analog (K4 resources dim,
        exporter_resources.go:141-144).

        Parquet backend, bucket-scoped: the dim is partitioned by
        _bucket = hash(keys) % n_buckets; an upsert reads + merges +
        rewrites ONLY the buckets its rows touch (partition-pruned scan),
        leaving every other bucket's files byte-untouched — the dynamic
        partition-overwrite shape. At 100 TB with Iceberg this is a real
        MERGE INTO.

        Crash safety (parquet stand-in): every bucket's previous copy is
        moved ASIDE (a sibling dir OUTSIDE the table, so partition
        discovery never sees it) before the new copy moves in, and
        `_recover_upsert` at the start of the next upsert restores any
        aside whose bucket went missing mid-swap — no state loses data,
        though a read between a crash and the next upsert may miss the
        in-flight bucket (a real MERGE's snapshot isolation needs Iceberg).
        A legacy/unbucketed table falls back to a full staged rewrite."""
        import shutil
        import uuid

        import pyspark.sql.functions as F
        from pyspark.sql import Window

        spark = df.sparkSession
        target = self.path(name)
        self._recover_upsert(target)
        bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
            "int"
        )
        new = df.withColumn("_bucket", bucket)

        legacy_full_rewrite = False
        if self.exists(name):
            existing_raw = spark.read.format(self.fmt).load(target)
            if "_bucket" not in existing_raw.columns:
                # pre-bucketing layout: migrate via one full staged rewrite
                legacy_full_rewrite = True
                touched = None
                existing = existing_raw.withColumn("_bucket", bucket)
                merged = existing.withColumn("_gen", F.lit(0)).unionByName(
                    new.withColumn("_gen", F.lit(1))
                )
            else:
                # bounded driver-side collect: <= n_buckets values
                touched = sorted(
                    r["_bucket"] for r in new.select("_bucket").distinct().collect()
                )
                existing = existing_raw.where(
                    F.col("_bucket").isin(touched)  # partition-pruned
                ).withColumn("_bucket", F.col("_bucket").cast("int"))
                merged = existing.withColumn("_gen", F.lit(0)).unionByName(
                    new.withColumn("_gen", F.lit(1))
                )
        else:
            touched = None
            merged = new.withColumn("_gen", F.lit(1))

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
        latest.write.format(self.fmt).partitionBy("_bucket").mode("overwrite").save(
            staging
        )
        if touched is None:
            # initial write or legacy migration: whole-table staged swap —
            # never leave a half-written table looking authoritative
            aside = f"{target}__aside_full"
            if os.path.exists(aside):
                shutil.rmtree(aside)
            if os.path.exists(target):
                os.rename(target, aside)
            os.rename(staging, target)
            if os.path.exists(aside):
                shutil.rmtree(aside)
            if legacy_full_rewrite:
                pass  # old layout fully replaced
            return

        # per-bucket swap; asides live OUTSIDE the table dir so partition
        # discovery never ingests them
        for b in touched:
            bdir = os.path.join(target, f"_bucket={b}")
            sdir = os.path.join(staging, f"_bucket={b}")
            aside = f"{target}__aside_bucket_{b}"
            if not os.path.exists(sdir):
                continue  # every key of this bucket was superseded away (can't happen with last-writer-wins, but stay safe)
            if os.path.exists(aside):
                shutil.rmtree(aside)  # completed leftover from a crashed run
            if os.path.exists(bdir):
                os.rename(bdir, aside)
            os.rename(sdir, bdir)
            if os.path.exists(aside):
                shutil.rmtree(aside)
        shutil.rmtree(staging, ignore_errors=True)

    def _recover_upsert(self, target: str) -> None:
        """Heal a crashed upsert: restore any aside dir whose bucket is
        missing (crash between rename-aside and move-in), drop asides whose
        bucket exists (crash after move-in), purge stale staging dirs."""
        import shutil

        parent = os.path.dirname(target) or "."
        base = os.path.basename(target)
        if not os.path.isdir(parent):
            return
        for d in os.listdir(parent):
            full = os.path.join(parent, d)
            if d == f"{base}__aside_full":
                if not os.path.exists(target):
                    os.rename(full, target)  # restore the whole table
                else:
                    shutil.rmtree(full, ignore_errors=True)
            elif d.startswith(f"{base}__aside_bucket_"):
                b = d.rsplit("_", 1)[1]
                bdir = os.path.join(target, f"_bucket={b}")
                if not os.path.exists(bdir):
                    os.makedirs(target, exist_ok=True)
                    os.rename(full, bdir)  # restore the in-flight bucket
                else:
                    shutil.rmtree(full, ignore_errors=True)
            elif d.startswith(f"{base}__stage_"):
                shutil.rmtree(full, ignore_errors=True)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        # a landed table is data files and/or hive-style partition dirs
        # (<col>=<val> — any partition column, e.g. api_key= for the intake)
        return os.path.exists(p) and any(
            f.endswith(".parquet") or f.startswith("part-") or "=" in f
            for f in os.listdir(p)
        )
