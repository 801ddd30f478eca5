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


def test_media_codecs_roundtrip():
    """PNG/WAV/frame-container: encode -> decode bit-identical, plus a
    hand-filtered PNG (filters 1-4) to prove the decoder is spec-real."""
    import numpy as np
    import zlib, struct
    from datafusion_orc_spark.functions.media_codecs import (
        frames_decode, frames_encode, png_decode, png_encode, wav_decode, wav_encode,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)
    s = (np.sin(np.arange(4000) / 7.0) * 20000).astype(np.int16)
    rate, out = wav_decode(wav_encode(s, 8000))
    assert rate == 8000 and np.array_equal(out, s)
    fr = [png_encode(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)) for _ in range(3)]
    assert frames_decode(frames_encode(fr)) == fr

    # independent PNG with non-zero filters: build IDAT by filtering rows
    # with Sub(1)/Up(2)/Average(3)/Paeth(4) per the spec, decoder must undo
    h, w = 4, 5
    img2 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    rows = img2.reshape(h, w * 3).astype(np.int32)
    raw = bytearray()
    for y, f in enumerate([1, 2, 3, 4]):
        line = rows[y].copy()
        prev = rows[y - 1] if y else np.zeros(w * 3, np.int32)
        enc = line.copy()
        for x in range(w * 3):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 1: pred = a
            elif f == 2: pred = b
            elif f == 3: pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f); raw.extend(enc.astype(np.uint8).tobytes())
    sig = b"\x89PNG\r\n\x1a\n"
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png), img2)


def test_multimodal_real_decode_features(spark):
    """Features must reflect the actual decoded signal, not byte stats:
    a bright PNG yields higher mean than a dark one; a loud WAV yields
    higher RMS than a quiet one; video motion is non-zero."""
    import numpy as np
    from datafusion_orc_spark.functions.media_codecs import png_encode, wav_encode
    from datafusion_orc_spark.functions.multimodal import decode_features

    bright = decode_features(png_encode(np.full((16, 16, 3), 220, np.uint8)), "image")
    dark = decode_features(png_encode(np.full((16, 16, 3), 20, np.uint8)), "image")
    assert bright[0] > dark[0] + 0.5
    loud = decode_features(wav_encode((np.sin(np.arange(8000) / 3) * 30000).astype(np.int16)), "audio")
    quiet = decode_features(wav_encode((np.sin(np.arange(8000) / 3) * 1000).astype(np.int16)), "audio")
    assert loud[1] > quiet[1] * 5
    from datafusion_orc_spark.functions.multimodal import synthetic_media, extract_features

    feats = extract_features(synthetic_media(spark, 30)).toPandas()
    vid = feats[feats["kind"] == "video"]["feature"]
    assert len(vid) and all(f[15] > 0 for f in vid)  # real inter-frame motion


def test_windowed_event_counts_with_late_data(spark, tmp_path):
    """Watermarked tumbling windows over a rate-limited file stream:
    counts per window match a batch groupBy over the same rows, and an
    event later than the watermark is dropped."""
    import datetime as dt
    from datafusion_orc_spark.streaming.incremental import windowed_event_counts

    src = str(tmp_path / "src"); out = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [(base + dt.timedelta(seconds=s), "click", 1.0) for s in (5, 15, 65, 70)]
    spark.createDataFrame(rows1, "ts timestamp, event_type string, value double") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    q = (windowed_event_counts(stream, window_seconds=60, watermark_seconds=30)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # batch 2 advances the watermark to 570s -> both windows finalize;
    # batch 3 then delivers an event at 20s, far behind the watermark,
    # whose window is already closed -> Structured Streaming drops it
    rows2 = [(base + dt.timedelta(seconds=600), "click", 1.0)]
    spark.createDataFrame(rows2, "ts timestamp, event_type string, value double") \
        .coalesce(1).write.mode("append").parquet(src)
    q = (windowed_event_counts(stream, window_seconds=60, watermark_seconds=30)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows3 = [(base + dt.timedelta(seconds=20), "late", 99.0)]
    spark.createDataFrame(rows3, "ts timestamp, event_type string, value double") \
        .coalesce(1).write.mode("append").parquet(src)
    q = (windowed_event_counts(stream, window_seconds=60, watermark_seconds=30)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"].second + r["window_start"].minute * 60, r["event_type"]): r["n"]
           for r in spark.read.parquet(out).collect()}
    assert got.get((0, "click")) == 2      # window [0,60): events at 5s,15s
    assert got.get((60, "click")) == 2     # window [60,120): 65s,70s
    assert all(k[1] != "late" for k in got)  # late event dropped by watermark


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: events within the gap merge;
    a later event opens a new session; state times out via the event-time
    watermark."""
    import datetime as dt
    from datafusion_orc_spark.streaming.incremental import sessionize_events

    src = str(tmp_path / "src"); ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1)
    rows1 = [(base + dt.timedelta(seconds=s), 1) for s in (0, 100, 200)] + [
        (base + dt.timedelta(seconds=50), 2),
        (base + dt.timedelta(seconds=1000), 1),  # > gap: closes session 1
    ]
    spark.createDataFrame(rows1, "ts timestamp, user_id long") \
        .coalesce(1).write.mode("overwrite").parquet(src)

    def run_once(name):
        stream = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
        q = (sessionize_events(stream, gap_seconds=300, watermark_seconds=60)
             .writeStream.format("memory").queryName(name).outputMode("update")
             .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["user_id"], r["session_start"].second + 60 * r["session_start"].minute): r["n_events"]
                for r in spark.sql(f"SELECT * FROM {name}").collect()}

    got = run_once("sess1")
    # the 1000s event exceeded the 300s gap -> user 1's first session
    # (0..200s, 3 events) is emitted inline
    assert got.get((1, 0)) == 3, got


def test_incremental_decode_stream(spark, tmp_path):
    """The inverse stream: blob files decoded per micro-batch back to
    rows; the full encode->stream-decode round trip preserves every
    row, and a where= predicate yields exactly the matching rows."""
    from datafusion_orc_spark.sources.tokens import tokenized_sequences
    from datafusion_orc_spark.streaming.incremental import (
        start_incremental_decode,
        start_incremental_encode,
    )

    src = str(tmp_path / "src")
    seqs = tokenized_sequences(spark, SF_DIR)
    seqs.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(seqs.schema).parquet(src)
    enc_out, enc_ckpt = str(tmp_path / "enc"), str(tmp_path / "ckpt_e")
    start_incremental_encode(stream, enc_out, enc_ckpt, stripe_rows=128).awaitTermination(120)

    dec_out, dec_ckpt = str(tmp_path / "dec"), str(tmp_path / "ckpt_d")
    q = start_incremental_decode(spark, enc_out, seqs.schema, dec_out, dec_ckpt)
    q.awaitTermination(120)
    decoded = spark.read.parquet(*glob.glob(f"{dec_out}/batch=*"))
    assert decoded.count() == seqs.count()
    from pyspark.sql import functions as F

    assert (
        decoded.agg(F.sum("n_tok")).collect()[0][0]
        == seqs.agg(F.sum("n_tok")).collect()[0][0]
    )

    # filtered variant: stripe pruning + exact residual per batch
    dec2, ck2 = str(tmp_path / "dec2"), str(tmp_path / "ckpt_d2")
    q2 = start_incremental_decode(
        spark, enc_out, seqs.schema, dec2, ck2, where="n_tok >= 50"
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(*glob.glob(f"{dec2}/batch=*"))
    assert got.count() == seqs.filter("n_tok >= 50").count()
    assert got.filter("n_tok < 50").count() == 0
