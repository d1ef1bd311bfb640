"""SparkSession factory tuned for the pipeline.

Scale notes (100 TB design, local[*] test):
- AQE on: runtime coalescing + skew-join splitting handles Zipfian host skew
  (the reference never faces skew — per-batch in-memory maps; we must).
- shuffle.partitions sized for local tests; on a real cluster this is
  ~2-3x total cores and AQE coalesces down.
- Arrow enabled for pandas UDFs (the vectorized parse stage).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sts-otel-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cores) * 2, 8)
        except (TypeError, ValueError):
            shuffle_partitions = 64

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 16 MB splits: local test inputs are a few hundred MB against 32
        # cores — 128 MB splits would leave most cores idle. On a real
        # cluster with TB-scale inputs raise this back to 128-256 MB.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: ONE JVM hosts all executor threads — size the heap
        # for the concurrency (32 tasks x Arrow batches in 8g thrashes GC
        # and inverts scaling).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Mapping-engine semantics: expression eval errors mean "condition
        # false / field skipped", not job failure — mirrors the reference's
        # eval-error handling (mapping_handler.go:124-145). ANSI-off gives
        # null-on-error; LAST_WIN lets explicit tag keys override
        # regex-derived ones (mapping.go:182-245).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # Idempotent resume: reruns overwrite exactly the partitions they
        # recompute (lineage.py), never the whole table.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_semantics_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the mapping engine's semantics depend on —
    call this when the session is supplied externally (driver, spark-submit
    without submit.sh's --conf flags). On Spark 4.x ANSI defaults to TRUE,
    which would turn expression eval errors into job failures and
    map_concat key collisions into exceptions."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
