"""Real media byte-formats, pure numpy + zlib (no PIL/librosa in this
container): a PNG encoder/decoder (truecolor 8-bit, all five scanline
filters on decode), a WAV (RIFF/PCM16) writer/parser, and a minimal
multi-frame container for the video path. These replace the r1 decode
stub so the multimodal operators parse actual encoded bytes.

PNG per the W3C spec (signature, IHDR/IDAT/IEND chunks, zlib stream,
per-scanline filter byte); WAV per the canonical RIFF layout.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> PNG bytes (truecolor 8-bit, filter 0, zlib)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Row-sequential (the spec's
    data dependency), vectorized within each row where possible."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter {f}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 (truecolor 8-bit subset; filters 0-4)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: bad crc in {tag!r}")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError("png subset: 8-bit truecolor, no interlace")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 3
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# ------------------------------------------------------------------ WAV

def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 PCM -> canonical RIFF/WAVE bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, mono int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF header")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise NotImplementedError("wav subset: mono PCM16")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt/data chunk")
    return rate, samples


# ------------------------------------------- multi-frame video container

_VID_MAGIC = b"DOSV1\x00"


def frames_encode(frames: list[bytes]) -> bytes:
    """PNG frame list -> length-prefixed container bytes."""
    out = bytearray(_VID_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def frames_decode(data: bytes) -> list[bytes]:
    if data[:6] != _VID_MAGIC:
        raise ValueError("video: bad magic")
    (n,) = struct.unpack("<I", data[6:10])
    pos = 10
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames
