#!/usr/bin/env python
"""sf3 compute-pair probe (r6 verdict task #6): one octave above the
sf1 gate evidence.

The sf1 executor pair now clears the >=0.8 north rule on the binding
record; this probe confirms the compute-scaling linearity holds past
2.5 B tokens (sf3 = 30x the sf0.1 bench table, ~7.6 B tokens) and that
stripe_id windows / split planning behave at that size. Discard-only
(encode fully in-task, drop blobs): the pure scan+encode compute pair,
the cluster-predictive reading (write-path page-fault tax is a per-box
kernel cost, see jobs/bench_sf1_probe.py).

2 interleaved rounds x 2 walls per level, 1 warmup per session.
Prints one JSON line and writes artifacts_sf3_probe_latest.json;
run AFTER bench.py, never concurrently. Needs ~20 GB free in /tmp.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (pins allocators before the JVM spawns)


def main() -> None:
    from pyspark.sql import functions as F

    rows = bench.BENCH_ROWS * 30
    boot = bench.build_session(8)
    boot.sparkContext.setLogLevel("ERROR")
    sf3_path = bench.materialize_tokens(boot, rows)
    total_tokens = boot.read.parquet(sf3_path).agg(F.sum("n_tok")).collect()[0][0]
    boot.stop()

    from datafusion_orc_spark.operators.encode import encode_files

    def run(lspark, par: int) -> float:
        t0 = time.time()
        encode_files(
            lspark, sf3_path, stripe_rows=16384,
            parallelism=par, discard_output=True,
        ).collect()
        wall = time.time() - t0
        os.sync()
        return round(wall, 3)

    walls: dict[int, list[float]] = {1: [], 4: []}
    for _round in range(2):
        for n_exec in (1, 4) if _round % 2 == 0 else (4, 1):
            lspark = bench.build_session(32, master=f"local-cluster[{n_exec},2,2048]")
            lspark.sparkContext.setLogLevel("ERROR")
            try:
                run(lspark, n_exec * 2)  # warmup (arena faults untimed)
                for _ in range(2):
                    walls[n_exec].append(run(lspark, n_exec * 2))
            finally:
                lspark.stop()

    out = {
        "metric": "sf3 compute-pair probe (discard_output, 1x2 vs 4x2)",
        "rows": rows,
        "total_tokens": int(total_tokens),
        "executors_1_walls": walls[1],
        "executors_4_walls": walls[4],
        "tokens_per_sec_1x2": round(total_tokens / min(walls[1])),
        "tokens_per_sec_4x2": round(total_tokens / min(walls[4])),
        "efficiency_exec_1_4_compute": round(min(walls[1]) / min(walls[4]) / 4.0, 3),
        "efficiency_exec_1_4_compute_median": round(
            statistics.median(walls[1]) / statistics.median(walls[4]) / 4.0, 3
        ),
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "artifacts_sf3_probe_latest.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
