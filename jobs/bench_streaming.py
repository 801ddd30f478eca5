#!/usr/bin/env python
"""Streaming decode latency bench (r4 verdict task #7).

Measures the watch-blob-dir -> incremental decode stream at sf0.1: the
full token table is encoded to blob part files once (untimed), then a
single availableNow stream with maxFilesPerTrigger slices them into
micro-batches; each batch's decode+write wall comes from the stream's
own lineage records (streaming/incremental.py start_incremental_decode).

Prints one JSON line with the per-micro-batch wall distribution and
rows/s. Run from /root/repo:

    python jobs/bench_streaming.py

Env: SPARK_GRAFT_BENCH_ROWS (default 240000 = the sf0.1-scale table),
SPARK_GRAFT_STREAM_FILES_PER_TRIGGER (default 4).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (pins allocators before the JVM spawns)


def main() -> None:
    per_trigger = int(os.environ.get("SPARK_GRAFT_STREAM_FILES_PER_TRIGGER", "4"))
    spark = bench.build_session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    tokens_path = bench.materialize_tokens(spark)
    schema = spark.read.parquet(tokens_path).schema

    # one untimed bulk encode produces the blob files the stream watches
    from datafusion_orc_spark.operators.encode import encode_files
    from datafusion_orc_spark.streaming.incremental import start_incremental_decode

    blob_dir = "/tmp/spark_graft_stream_blobs"
    out_dir = "/tmp/spark_graft_stream_out"
    ckpt_dir = "/tmp/spark_graft_stream_ckpt"
    for d in (blob_dir, out_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    encode_files(spark, tokens_path, stripe_rows=16384, output_dir=blob_dir).collect()
    n_files = len(glob.glob(f"{blob_dir}/**/*.parquet", recursive=True))
    os.sync()

    t0 = time.time()
    q = start_incremental_decode(
        spark,
        blob_dir,
        schema,
        out_dir,
        ckpt_dir,
        max_files_per_trigger=per_trigger,
    )
    q.awaitTermination()
    stream_wall = round(time.time() - t0, 3)

    lineage = []
    for p in sorted(glob.glob(f"{out_dir}/_lineage_batch_*.json")):
        with open(p) as f:
            lineage.append(json.load(f))
    lineage.sort(key=lambda d: d["batch_id"])
    walls = [d["wall_sec"] for d in lineage]
    rows = [d["out_rows"] for d in lineage]
    total_rows = sum(rows)
    out = {
        "metric": "streaming decode micro-batch wall (blob files -> rows)",
        "unit": "sec",
        "sf": bench.SF_DIR.rstrip("/").split("sf")[-1],
        "blob_files": n_files,
        "files_per_trigger": per_trigger,
        "n_batches": len(walls),
        "batch_walls": walls,
        "batch_rows": rows,
        "wall_min": min(walls),
        "wall_median": round(statistics.median(walls), 3),
        "wall_p90": round(sorted(walls)[int(0.9 * (len(walls) - 1))], 3),
        "wall_max": max(walls),
        "rows_per_sec_overall": round(total_rows / sum(walls)),
        "total_rows": total_rows,
        "stream_wall_end_to_end": stream_wall,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
