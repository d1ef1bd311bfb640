"""spark-submit entry point: run (or resume) the flagship pipeline.

The SparkSession comes from spark-submit's conf (cluster mode); only
job-level parameters are read here.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from sts_opentelemetry_collector_spark.plans.pipeline import run_pipeline


def main() -> None:
    webtext_path, out_root = sys.argv[1], sys.argv[2]
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = SparkSession.builder.getOrCreate()
    summary = run_pipeline(spark, webtext_path, out_root, n_lineage_buckets=buckets)
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
