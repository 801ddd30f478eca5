"""M5 — chunked encode job: lineage manifest, atomic commit, resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datafusion_orc_spark.operators.encode import decode_table
from datafusion_orc_spark.plans.pipeline import (
    encode_job,
    read_encoded,
    read_manifest,
    salted_repartition,
)
from datafusion_orc_spark.sources.tokens import tokenized_sequences

SF_DIR = "/root/testdata/sf0.001"


def test_salted_repartition_balances_skew(spark):
    # source is ~50% one key; partitioning by doc_id hash must balance
    seqs = tokenized_sequences(spark, SF_DIR)
    parts = (
        salted_repartition(seqs, 8)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in parts]
    assert len(counts) == 8
    assert max(counts) < 2.0 * (sum(counts) / len(counts)), counts


def test_encode_job_and_resume(spark, tmp_path):
    out = str(tmp_path / "encoded")
    seqs = tokenized_sequences(spark, SF_DIR)
    m1 = encode_job(spark, seqs, out, n_chunks=3, partitions_per_chunk=2, stripe_rows=200)
    assert len(m1["chunks"]) == 3
    assert all(c["input_snapshot_id"] == m1["snapshot_id"] for c in m1["chunks"].values())
    total_rows_enc = sum(c["stripes"] for c in m1["chunks"].values())
    assert total_rows_enc > 0

    # decoded rows across chunks == input rows, values identical
    blobs = read_encoded(spark, out)
    decoded = decode_table(blobs.select("stripe_id", "column", "data"), None, seqs.schema)
    assert decoded.count() == seqs.count()
    a = seqs.agg(F.sum("n_tok")).collect()[0][0]
    b = decoded.agg(F.sum("n_tok")).collect()[0][0]
    assert a == b

    # resume: drop one chunk from the manifest, rerun -> only it re-encodes
    manifest = read_manifest(out)
    removed = manifest["chunks"].pop("1")
    with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    m2 = encode_job(spark, seqs, out, n_chunks=3, partitions_per_chunk=2, stripe_rows=200)
    assert set(m2["chunks"]) == {"0", "1", "2"}
    # re-encoded chunk must carry identical lineage counts (deterministic chunking)
    assert m2["chunks"]["1"]["blob_rows"] == removed["blob_rows"]
    assert m2["chunks"]["1"]["raw_bytes"] == removed["raw_bytes"]
    # untouched chunks keep their original commit timestamps
    assert m2["chunks"]["0"] == m1["chunks"]["0"]
