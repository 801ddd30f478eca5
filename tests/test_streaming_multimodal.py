"""Streaming incremental encode + multimodal plumbing tests."""

import glob
import json

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_encode_stream(spark, tmp_path):
    from datafusion_orc_spark.operators.encode import decode_table
    from datafusion_orc_spark.sources.tokens import tokenized_sequences
    from datafusion_orc_spark.streaming.incremental import start_incremental_encode

    # stage the batch table as a file-stream source (one file per partition)
    src = str(tmp_path / "src")
    seqs = tokenized_sequences(spark, SF_DIR)
    seqs.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(seqs.schema).option("maxFilesPerTrigger", 1).parquet(src)

    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")
    q = start_incremental_encode(stream, out, ckpt, stripe_rows=128)
    q.awaitTermination(120)

    batch_dirs = glob.glob(f"{out}/batch=*")
    assert len(batch_dirs) >= 1
    blobs = spark.read.parquet(*batch_dirs)
    decoded = decode_table(blobs.select("stripe_id", "column", "data"), None, seqs.schema)
    assert decoded.count() == seqs.count()
    lineage = sorted(glob.glob(f"{out}/_lineage_batch_*.json"))
    assert lineage
    rec = json.loads(open(lineage[0]).read())
    assert rec["blob_rows"] > 0 and rec["enc_bytes"] > 0


def test_multimodal_features(spark):
    from datafusion_orc_spark.functions.multimodal import (
        extract_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, 64)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows[:5]:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
    # determinism: same input -> same features
    again = extract_features(media, dim=16).collect()
    assert {r["media_id"]: r["feature"] for r in rows} == {r["media_id"]: r["feature"] for r in again}

    plan = frame_sample_plan(media, every_ms=10000)
    n_videos = media.filter(F.col("kind") == "video").count()
    if n_videos:
        assert plan.count() >= n_videos
    assert plan.columns == ["media_id", "sample_ms"]
