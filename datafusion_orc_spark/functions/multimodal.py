"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is REAL (since r2): payloads are actual PNG / RIFF-WAV /
multi-frame-container bytes produced and parsed by
``functions/media_codecs.py`` (pure numpy + zlib — the heavyweight
codecs PIL/librosa aren't in this container, so the formats are the
spec-simple ones, but every byte is genuinely encoded and decoded).
Features are real signal statistics: per-channel means/stds + gray
quadrant pooling for images, RMS/zero-crossings/FFT band energies for
audio, frame count + mean inter-frame motion for video.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),  # real encoded bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16
_RATE = 8000


def _make_payload(media_id: int, kind: str) -> tuple[bytes, int, int, int]:
    """Deterministic REAL media bytes for one row -> (payload, w, h, ms)."""
    from datafusion_orc_spark.functions.media_codecs import (
        frames_encode,
        png_encode,
        wav_encode,
    )

    rng = np.random.default_rng(media_id * 1_000_003 + 7)
    if kind == "image":
        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        x = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
        y = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
        grad = (x * 127 + y * 127).astype(np.uint8) + rng.integers(0, 32, (h, w, 3), dtype=np.uint8)
        return png_encode(grad), w, h, 0
    if kind == "audio":
        ms = int(rng.integers(100, 800))
        t = np.arange(_RATE * ms // 1000) / _RATE
        freq = float(rng.integers(100, 2000))
        sig = (np.sin(2 * np.pi * freq * t) * 12000 + rng.normal(0, 800, len(t))).astype(np.int16)
        return wav_encode(sig, _RATE), 0, 0, ms
    # video: a few PNG frames with a moving bright square (real motion)
    from datafusion_orc_spark.functions.media_codecs import png_encode as _pe

    w = h = 24
    n_frames = int(rng.integers(2, 6))
    frames = []
    for f in range(n_frames):
        img = rng.integers(0, 32, (h, w, 3), dtype=np.uint8)
        pos = (f * 4) % (w - 8)
        img[8:16, pos : pos + 8] = 240
        frames.append(_pe(img))
    return frames_encode(frames), w, h, n_frames * 40


def synthetic_media(spark, n_rows: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads, generated
    distributed (mapInPandas over an id range — scales with partitions)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                kind = kinds[int(mid + seed) % 3]
                payload, w, h, ms = _make_payload(int(mid), kind)
                rows.append((int(mid), kind, payload, w, h, ms))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


def _image_features(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    fl = img.reshape(-1, 3).astype(np.float32)
    f[0:3] = fl.mean(axis=0) / 255.0
    f[3:6] = fl.std(axis=0) / 255.0
    gray = img.mean(axis=2)
    # 2x2 quadrant means + global min/max
    f[6] = gray[: h // 2, : w // 2].mean() / 255.0
    f[7] = gray[: h // 2, w // 2 :].mean() / 255.0
    f[8] = gray[h // 2 :, : w // 2].mean() / 255.0
    f[9] = gray[h // 2 :, w // 2 :].mean() / 255.0
    f[10] = gray.min() / 255.0
    f[11] = gray.max() / 255.0
    f[12] = w / 1000.0
    f[13] = h / 1000.0
    return f


def _audio_features(rate: int, s: np.ndarray) -> np.ndarray:
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    x = s.astype(np.float32) / 32768.0
    f[0] = len(x) / rate  # duration sec
    f[1] = float(np.sqrt(np.mean(x * x)))  # RMS
    f[2] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))) > 0))  # ZCR
    spec = np.abs(np.fft.rfft(x[: 1 << 12]))
    bands = np.array_split(spec, 4)
    e = np.array([float((b * b).sum()) for b in bands])
    tot = e.sum() or 1.0
    f[3:7] = (e / tot).astype(np.float32)  # band energy ratios
    f[7] = float(x.max())
    f[8] = float(x.min())
    return f


def _video_features(frames: list[np.ndarray]) -> np.ndarray:
    f = _image_features(frames[0]).copy()
    f[14] = len(frames) / 100.0
    if len(frames) > 1:
        diffs = [
            np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
            for a, b in zip(frames[:-1], frames[1:])
        ]
        f[15] = float(np.mean(diffs)) / 255.0  # mean inter-frame motion
    return f


def decode_features(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode + feature extraction for one payload."""
    from datafusion_orc_spark.functions.media_codecs import (
        frames_decode,
        png_decode,
        wav_decode,
    )

    if kind == "image":
        return _image_features(png_decode(payload))
    if kind == "audio":
        return _audio_features(*wav_decode(payload))
    if kind == "video":
        return _video_features([png_decode(fb) for fb in frames_decode(payload)])
    raise ValueError(f"unknown media kind {kind!r}")


def extract_features(media_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one pandas frame per
    batch; the decode runs per payload (real codecs are per-payload),
    everything around it is batch-shaped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_features(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media_df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: which (media_id, timestamp) pairs to
    decode — pure DataFrame math (sequence/explode), no Python."""
    return (
        media_df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("sample_ms"),
        )
    )
