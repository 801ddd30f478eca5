#!/usr/bin/env python
"""Per-query isolation harness for the optimization round (guide §1).

NOT the frozen bench: this file exists so optimizations can be measured
query-by-query without paying the full bench.py protocol each time.
Reproduces bench.py's session configuration exactly (same master, same
confs), then for each requested query:

  - 1 untimed warmup (plan compilation + python worker spawn),
  - N timed walls with .collect() (the frozen bench's methodology),
  - N timed walls with the noop sink (guide §1.4 — computation only,
    no driver row transfer), reported separately,
  - .explain("formatted") captured to plans/r08/<name>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--tag before|after] [--runs N] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary", "top_customers", "order_ranks", "token_stats",
    "dedup_minhash", "ann_cosine_topk", "ann_lsh_topk",
    "roundtrip_lineitem_agg",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--tag", default=None, help="also write plans/r08/<q>_<tag>.txt")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="also time noop-sink walls")
    ap.add_argument("--out", default=None, help="write results json here")
    args = ap.parse_args()
    names = args.queries or BENCH_QUERIES

    from bench import CPUS, build_session
    from datafusion_orc_spark.plans.queries import QUERIES, release_quantized_emb

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name} warmup")
        df = fn(spark, args.sf)
        if args.tag:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        df.collect()  # warmup, untimed
        walls, noop_walls = [], []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} run {i}")
            t0 = time.time()
            fn(spark, args.sf).collect()
            walls.append(round(time.time() - t0, 3))
        if args.noop:
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"bench_extra: {name} noop {i}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                noop_walls.append(round(time.time() - t0, 3))
        out[name] = {"collect": walls, "min": min(walls)}
        if noop_walls:
            out[name]["noop"] = noop_walls
            out[name]["noop_min"] = min(noop_walls)
        print(f"{name}: collect={walls} noop={noop_walls}", file=sys.stderr)
    release_quantized_emb(spark)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
