#!/usr/bin/env python
"""sf1 scaling attribution probe (r4 verdict task #1).

The r5 sf1 diagnostics ruled OUT IO wait (iowait ~0.002) and task skew
(max/median ~1.05): per-task compute itself inflates machine-wide
across rounds. The remaining suspect is the output path — every run
first-touch faults ~4.7 GB of fresh page-cache pages for its blob part
files, and fault service on this VM is a shared, poorly-parallelizing
kernel cost (a per-box constant, not an engine property).

This probe runs the SAME sf1 encode pair (local-cluster 1x2 vs 4x2) in
two modes inside one interleaved window:
  write   — the normal job (blob part files written in-task)
  discard — encode fully, drop blobs in-task (stats only; no output
            pages faulted)
If discard scales >= 0.8 while write stays lower, the gap is the
output-page fault tax, which a real cluster pays per-node.

Prints one JSON line; run AFTER bench.py, never concurrently.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (pins allocators before the JVM spawns)


def main() -> None:
    from pyspark.sql import functions as F

    rows = bench.BENCH_ROWS * 10
    boot = bench.build_session(4)
    boot.sparkContext.setLogLevel("ERROR")
    sf1_path = bench.materialize_tokens(boot, rows)
    total_tokens = boot.read.parquet(sf1_path).agg(F.sum("n_tok")).collect()[0][0]
    boot.stop()

    from datafusion_orc_spark.operators.encode import encode_files

    def run(lspark, discard: bool, par: int) -> float:
        # recycle mode, per-level dirs — the same write path bench.py
        # measures (in-place overwrite of warm part files; r6)
        out = None if discard else bench.blob_out(par)
        t0 = time.time()
        encode_files(
            lspark, sf1_path, stripe_rows=16384,
            output_dir=out, parallelism=par, discard_output=discard,
            recycle_output=not discard,
        ).collect()
        wall = time.time() - t0
        os.sync()
        return round(wall, 3)

    walls: dict[tuple[str, int], list[float]] = {}
    for _round in range(2):
        for mode in ("discard", "write"):
            for n_exec in (1, 4):
                lspark = bench.build_session(
                    32, master=f"local-cluster[{n_exec},2,2048]"
                )
                lspark.sparkContext.setLogLevel("ERROR")
                try:
                    run(lspark, mode == "discard", n_exec * 2)  # warmup
                    for _ in range(2):
                        walls.setdefault((mode, n_exec), []).append(
                            run(lspark, mode == "discard", n_exec * 2)
                        )
                finally:
                    lspark.stop()

    out = {"metric": "sf1 scaling attribution (write vs discard)", "rows": rows,
           "total_tokens": int(total_tokens)}
    for mode in ("discard", "write"):
        w1, w4 = walls[(mode, 1)], walls[(mode, 4)]
        out[f"{mode}_1x2_walls"] = w1
        out[f"{mode}_4x2_walls"] = w4
        out[f"{mode}_efficiency_1_4"] = round((min(w1) / min(w4)) / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
