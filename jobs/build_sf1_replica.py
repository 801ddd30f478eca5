#!/usr/bin/env python
"""Build a timing-only sf1.0-SHAPED replica from /root/testdata/sf0.1.

The driver's round-end measurement escalates to its own generated sf1.0
(BENCH_r07.json: "sf": "1.0"), whose tables this sandbox does not keep.
For optimization work that must hold at that scale, this script rebuilds
the second pass's replica: every sf0.1 table concatenated N times (default
10) with per-copy key offsets, written with 1 Mi-row parquet row groups to
match the driver's sf1.0 shape (its 6M-row lineitem carries 6 row groups —
scan parallelism, and therefore plan shape, depends on this).

Timing-only: the data distribution is a clone, not the generator's. Two
perturbations keep candidate-set geometry realistic instead of
degenerate:
  - documents.text gets a per-copy suffix token, so the 10 copies of a
    document do NOT share minhash/simhash/ngram buckets (real sf1 dups
    are rare; 10 identical clones would put >=10 members in every LSH
    bucket and overstate dedup work ~45x);
  - embeddings get small deterministic per-copy noise for the same
    reason (LSH band buckets spread instead of stacking 10 deep).

Oracle equivalence on the replica is still checkable with
jobs/drive_correctness.py <replica_dir>: DuckDB reads the same files, so
Spark-vs-oracle hashes must match on whatever the data is.

Usage: python jobs/build_sf1_replica.py [out_dir] [copies]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ROW_GROUP = 1 << 20  # the driver's sf1.0 files carry 1 Mi-row row groups

# key column -> per-copy offset = COPIES * (its sf0.1 table's row count)
OFFSETS = {
    "l_orderkey": 600_000,  # orders keys span ~4x rows; offset by lineitem count is safe (> max o_orderkey)
    "o_orderkey": 600_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "l_partkey": 20_000,
    "p_partkey": 20_000,
    "l_suppkey": 1_000,
    "s_suppkey": 1_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
    "event_id": 100_000,
    "user_id": 10_000,
}

SMALL = {"region", "nation"}  # true dimensions: copied once, unchanged


def build(name: str) -> None:
    src = os.path.join(SRC, f"{name}.parquet")
    t = pq.read_table(src)
    if name in SMALL:
        pq.write_table(t, os.path.join(OUT, f"{name}.parquet"), row_group_size=ROW_GROUP)
        print(f"{name}: dim, copied once ({t.num_rows} rows)")
        return
    # key offsets must be > max(key) so copies never collide; verify
    for col in t.column_names:
        if col in OFFSETS:
            mx = pc.max(t[col]).as_py()
            assert mx is None or mx <= OFFSETS[col], (name, col, mx, OFFSETS[col])
    copies = []
    for i in range(COPIES):
        c = t
        for col in c.column_names:
            if col in OFFSETS and i > 0:
                c = c.set_column(
                    c.column_names.index(col), col,
                    pc.add(c[col], i * OFFSETS[col]).cast(c[col].type),
                )
        if name == "documents" and i > 0:
            # per-copy suffix token: keeps token volume ~identical but
            # de-stacks minhash/simhash/ngram buckets across copies
            c = c.set_column(
                c.column_names.index("text"), "text",
                pc.binary_join_element_wise(c["text"], f" r{i}", ""),
            )
        if name == "embeddings" and i > 0:
            emb = c["embedding"].combine_chunks()
            et = c.schema.field("embedding").type  # list<element: float> — keep exactly
            vals = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            # deterministic small per-copy noise (post-quantize visible:
            # quantization is round(x*1000), so 0.002-0.006 moves codes)
            j = np.arange(vals.size)
            vals = vals + ((i * 7 + j) % 5 - 2) * 0.002
            new = pa.ListArray.from_arrays(
                emb.offsets, pa.array(vals.astype(np.float32), type=et.value_type)
            ).cast(et)
            c = c.set_column(c.column_names.index("embedding"), "embedding", new)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(OUT, f"{name}.parquet"), row_group_size=ROW_GROUP)
    nrg = pq.ParquetFile(os.path.join(OUT, f"{name}.parquet")).metadata.num_row_groups
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows, {nrg} row groups")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        build(name)
    print(f"replica at {OUT} (copies={COPIES}, row_group={ROW_GROUP})")


if __name__ == "__main__":
    main()
