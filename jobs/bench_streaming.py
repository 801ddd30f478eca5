#!/usr/bin/env python
"""Streaming decode bench: latency AND throughput (r5 verdict task #3).

The watch-blob-dir -> incremental decode stream at sf0.1: the full token
table is encoded to blob part files once (untimed), then one availableNow
stream per batch-size level slices them into micro-batches; each batch's
decode+write wall comes from the stream's own lineage records
(streaming/incremental.py start_incremental_decode).

r5 measured a single files-per-trigger=4 level and found ~95% of each
2.5 s micro-batch wall is fixed trigger overhead (task launch + listing +
plan), i.e. 11.3 k rows/s end-to-end at sf0.1 — a latency reading, not a
throughput one. This version SWEEPS the batch size (the knob a real
deployment turns to trade latency for throughput) so both ends of the
curve are on record: small batches bound per-event latency, large batches
amortize the fixed overhead toward the batch decode path's rate.

Prints one JSON line with a per-level table. Run from /root/repo:

    python jobs/bench_streaming.py

Env: SPARK_GRAFT_BENCH_ROWS (default 240000 = the sf0.1-scale table),
SPARK_GRAFT_STREAM_SIZES (default "4,16,0"; 0 = all files in one batch).
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


def run_level(spark, schema, blob_dir: str, per_trigger: int, sink: str = "parquet") -> dict:
    out_dir = "/tmp/spark_graft_stream_out"
    ckpt_dir = "/tmp/spark_graft_stream_ckpt"
    for d in (out_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)

    from datafusion_orc_spark.streaming.incremental import start_incremental_decode

    t0 = time.time()
    q = start_incremental_decode(
        spark,
        blob_dir,
        schema,
        out_dir,
        ckpt_dir,
        max_files_per_trigger=per_trigger or None,
        sink=sink,
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
    return {
        "sink": sink,
        "files_per_trigger": per_trigger or "all",
        "n_batches": len(walls),
        "batch_walls": walls,
        "batch_rows": rows,
        "wall_min": min(walls),
        "wall_median": round(statistics.median(walls), 3),
        "wall_p90": round(sorted(walls)[int(0.9 * (len(walls) - 1))], 3),
        "wall_max": max(walls),
        "total_rows": total_rows,
        # rows/s over the summed in-batch walls (decode+write only) and
        # end-to-end (includes trigger scheduling gaps) — the gap between
        # them IS the fixed per-trigger overhead
        "rows_per_sec_batch_walls": round(total_rows / sum(walls)),
        "rows_per_sec_end_to_end": round(total_rows / stream_wall),
        "stream_wall_end_to_end": stream_wall,
    }


def _session():
    # 8g driver: one session now carries 3 sink modes x 3 levels of
    # availableNow streams (r7 added the files sink); accumulated
    # stream/listener state OOM'd the 4g heap at ~stage 24 (r7 run 1).
    # openCostInBytes=128M: a micro-batch of ~15 MB blob files would
    # otherwise bin-pack into 1-2 scan partitions (maxPartitionBytes
    # 128M), serializing the decode — per-file task granularity fans a
    # 16-file batch over 16 tasks. Files below maxPartitionBytes are
    # never SPLIT by this, so stripe co-location (the shuffle-free
    # decode invariant) is untouched.
    return bench.build_session(
        bench.CPUS,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.files.openCostInBytes": str(128 * 1024 * 1024),
        },
    )


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_STREAM_SIZES", "4,16,0").split(",")
    ]
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")

    tokens_path = bench.materialize_tokens(spark)
    schema = spark.read.parquet(tokens_path).schema

    # one untimed bulk encode produces the blob files every level watches
    from datafusion_orc_spark.operators.encode import encode_files

    blob_dir = "/tmp/spark_graft_stream_blobs"
    shutil.rmtree(blob_dir, ignore_errors=True)
    encode_files(spark, tokens_path, stripe_rows=16384, output_dir=blob_dir).collect()
    n_files = len(glob.glob(f"{blob_dir}/**/*.parquet", recursive=True))
    os.sync()

    # warmup: one throwaway single-batch stream faults the decode working
    # set (same ~50x first-touch penalty as the batch path) so level walls
    # measure the stream, not the arena fault storm
    first_mode = os.environ.get(
        "SPARK_GRAFT_STREAM_SINKS", "parquet,files,count"
    ).split(",")[0]
    run_level(spark, schema, blob_dir, 0, sink=first_mode)

    # sink modes in SPARK_GRAFT_STREAM_SINKS order (fresh session per
    # mode: bounds accumulated stream state). The box slows progressively
    # as a sweep churns page cache (r7: the back half of a 9-level sweep
    # read 3-10x slower than the front), so put the mode under
    # measurement FIRST. "files" = in-task decode+parquet-write via
    # decode_to_files (r7; no JVM row transfer, no per-batch write job);
    # "count" = compute-only sink (storage cost factored out).
    sink_modes = os.environ.get(
        "SPARK_GRAFT_STREAM_SINKS", "parquet,files,count"
    ).split(",")
    levels = []
    for mi, mode in enumerate(sink_modes):
        if mi > 0:
            spark.stop()
            spark = _session()
            spark.sparkContext.setLogLevel("ERROR")
        levels += [run_level(spark, schema, blob_dir, sz, sink=mode) for sz in sizes]
    out = {
        "metric": "streaming decode micro-batch walls + throughput sweep",
        "unit": "sec",
        "sf": bench.SF_DIR.rstrip("/").split("sf")[-1],
        "blob_files": n_files,
        "levels": levels,
    }
    print(json.dumps(out))
    spark.stop()
    best = max(levels, key=lambda d: d["rows_per_sec_end_to_end"])
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "artifacts_stream_latest.json"), "w") as f:
        json.dump(out, f)
    sys.stderr.write(
        f"best: {best['rows_per_sec_end_to_end']} rows/s "
        f"(sink={best['sink']}, fpt={best['files_per_trigger']})\n"
    )


if __name__ == "__main__":
    main()
