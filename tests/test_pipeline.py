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


def test_encode_files_job_and_resume(spark, tmp_path):
    """File-granular resumable job: encode via the no-JVM-data path,
    commit per chunk, resume skips committed chunks, decode matches."""
    from datafusion_orc_spark.plans.pipeline import encode_files_job, read_encoded

    src = str(tmp_path / "src")
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df.repartition(4).write.parquet(src)
    out = str(tmp_path / "enc")
    m1 = encode_files_job(spark, src, out, files_per_chunk=2, stripe_rows=1000)
    assert len(m1["chunks"]) == 2
    committed = {k: v["committed_at"] for k, v in m1["chunks"].items()}
    # resume: nothing recomputed
    m2 = encode_files_job(spark, src, out, files_per_chunk=2, stripe_rows=1000)
    assert {k: v["committed_at"] for k, v in m2["chunks"].items()} == committed
    # partial resume: drop one chunk commit, rerun -> only it recomputes
    del m2["chunks"]["1"]
    import json, os
    with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
        json.dump(m2, f)
    m3 = encode_files_job(spark, src, out, files_per_chunk=2, stripe_rows=1000)
    assert m3["chunks"]["0"]["committed_at"] == committed["0"]
    assert "1" in m3["chunks"]
    # decode across chunks matches the source
    blobs = read_encoded(spark, out)
    dec = decode_table(blobs, None, df.schema)
    assert dec.count() == df.count()
    a = df.agg(F.sum("l_quantity")).collect()[0][0]
    b = dec.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(a - b) < 1e-6
