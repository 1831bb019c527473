"""spark-submit entry point for the validation engine.

Packaging (north_rule: run via spark-submit --py-files on a cluster)::

    bash scripts/build_pyfiles.sh           # → dist/engine.zip
    spark-submit --py-files dist/engine.zip \
        scripts/run_validation_job.py \
        --input  /warehouse/transcripts \
        --conversations /warehouse/dims/conversations \
        --tools  /warehouse/dims/tools \
        --output /warehouse/validation \
        [--reference /warehouse/transcripts_ref] [--n-buckets 256]

Exit code 0 when every partition verdict passed, 2 when violations were
found (outputs still written), non-zero otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--conversations")
    p.add_argument("--tools")
    p.add_argument("--reference")
    p.add_argument("--output", required=True)
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--run-id", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-validation").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    from hdfs_anomaly_detection_spark.constraints import (
        TextEquals,
        ValidationRunner,
        default_transcript_checks,
    )
    from hdfs_anomaly_detection_spark.manifest import ValidationJob

    dims = {}
    if args.conversations:
        dims["conversations"] = spark.read.parquet(args.conversations)
    if args.tools:
        dims["tools"] = spark.read.parquet(args.tools)
    checks = default_transcript_checks(dims=bool(dims))
    reference = spark.read.parquet(args.reference) if args.reference else None
    if reference is not None:
        checks.append(TextEquals("text_equals"))

    runner = ValidationRunner(
        checks, n_buckets=args.n_buckets, dims=dims, reference=reference
    )
    job = ValidationJob(runner, args.output)
    summary = job.run(spark.read.parquet(args.input), run_id=args.run_id)
    print(json.dumps(summary))

    failed = job.verdicts(spark).filter("not passed").count()
    spark.stop()
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
