"""spark-submit entry point: run (or resume) the flagship pipeline.

The SparkSession comes from spark-submit's conf (cluster mode); only
job-level parameters are read here.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from sts_opentelemetry_collector_spark.plans.pipeline import run_pipeline
from sts_opentelemetry_collector_spark.sources.settings import load_mapping_set


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("webtext_path")
    ap.add_argument("out_root")
    ap.add_argument("buckets", nargs="?", type=int, default=256)
    ap.add_argument("--mappings", help="JSON/YAML mapping snapshot (settings file)")
    ap.add_argument("--previous-mappings", help="prior snapshot for tombstone diff")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    mappings = load_mapping_set(args.mappings) if args.mappings else None
    previous = (
        load_mapping_set(args.previous_mappings) if args.previous_mappings else None
    )
    summary = run_pipeline(
        spark,
        args.webtext_path,
        args.out_root,
        mappings=mappings,
        previous_mappings=previous,
        n_lineage_buckets=args.buckets,
    )
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
