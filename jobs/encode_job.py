#!/usr/bin/env python
"""spark-submit entry point for the resumable encode job.

Usage (north rule: ships via --py-files on a multi-executor cluster):

    zip -r engine.zip datafusion_orc_spark
    spark-submit --py-files engine.zip jobs/encode_job.py \
        --input  /data/tokens_parquet \
        --output /data/encoded \
        --chunks 64 --partitions-per-chunk 256 --stripe-rows 32768

Restarting the same command resumes from the last committed chunk
(_MANIFEST.json is the atomic checkpoint; see plans/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet path of the F1-shaped table")
    p.add_argument("--output", required=True, help="output dir for blob chunks + manifest")
    p.add_argument("--chunks", type=int, default=16)
    p.add_argument("--partitions-per-chunk", type=int, default=32)
    p.add_argument("--stripe-rows", type=int, default=32768)
    p.add_argument("--snapshot-id", default=None, help="input snapshot id for lineage")
    p.add_argument(
        "--mode", choices=("files", "dataframe"), default="files",
        help="files = fast path (python workers scan parquet row groups "
        "directly, no JVM data path; default); dataframe = general path "
        "(arbitrary DataFrame input, salted repartition for skew)",
    )
    p.add_argument("--files-per-chunk", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from datafusion_orc_spark.plans.pipeline import encode_files_job, encode_job

    spark = (
        SparkSession.builder.appName("datafusion-orc-spark-encode")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    if args.mode == "files":
        manifest = encode_files_job(
            spark,
            args.input,
            args.output,
            files_per_chunk=args.files_per_chunk,
            stripe_rows=args.stripe_rows,
            input_snapshot_id=args.snapshot_id,
        )
    else:
        df = spark.read.parquet(args.input)
        manifest = encode_job(
            spark,
            df,
            args.output,
            n_chunks=args.chunks,
            partitions_per_chunk=args.partitions_per_chunk,
            stripe_rows=args.stripe_rows,
            input_snapshot_id=args.snapshot_id,
        )
    json.dump(manifest, sys.stdout, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
