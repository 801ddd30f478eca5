"""E4/D3/D4 — byte RLE and boolean RLE.

ORC v1 byte-RLE: control byte c in [0,127] -> run of (c+3) copies of the
next byte; c in [128,255] -> literal list of (256-c) bytes. Booleans are
bit-packed MSB-first into bytes (np.packbits order) then byte-RLE'd.
Verified against corpus PRESENT/boolean streams (SURVEY.md §2.3 D3/D4).
"""

from __future__ import annotations

import numpy as np

_MIN_REPEAT = 3
_MAX_REPEAT = 130  # 127 + 3
_MAX_LITERAL = 128


def byte_rle_encode(data: bytes | np.ndarray) -> bytes:
    """Encode bytes with ORC byte-RLE. Vectorized run detection."""
    b = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data.astype(np.uint8, copy=False)
    n = len(b)
    if n == 0:
        return b""
    # run starts: positions where value changes
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(b[1:], b[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n))
    out = bytearray()
    lit_buf = bytearray()

    def flush_literals() -> None:
        i = 0
        while i < len(lit_buf):
            chunk = lit_buf[i : i + _MAX_LITERAL]
            out.append(256 - len(chunk))
            out.extend(chunk)
            i += _MAX_LITERAL
        lit_buf.clear()

    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= _MIN_REPEAT:
            flush_literals()
            val = int(b[s])
            rem = ln
            while rem >= _MIN_REPEAT:
                take = min(rem, _MAX_REPEAT)
                out.append(take - 3)
                out.append(val)
                rem -= take
            if rem:
                lit_buf.extend(bytes([val]) * rem)
        else:
            lit_buf.extend(b[s : s + ln].tobytes())
    flush_literals()
    return bytes(out)


def byte_rle_decode(data: bytes | np.ndarray, n: int | None = None) -> np.ndarray:
    """Decode ORC byte-RLE to a uint8 array (optionally bounded to n bytes)."""
    b = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    out_parts: list[np.ndarray] = []
    pos = 0
    total = 0
    nb = len(b)
    while pos < nb and (n is None or total < n):
        c = int(b[pos])
        pos += 1
        if c < 128:
            run = c + 3
            out_parts.append(np.full(run, b[pos], dtype=np.uint8))
            pos += 1
            total += run
        else:
            lit = 256 - c
            out_parts.append(b[pos : pos + lit])
            pos += lit
            total += lit
    out = np.concatenate(out_parts) if out_parts else np.empty(0, dtype=np.uint8)
    return out[:n] if n is not None else out


def bool_rle_encode(flags: np.ndarray) -> bytes:
    """Booleans -> MSB-first bit-packed bytes -> byte RLE (ORC boolean RLE)."""
    bits = np.asarray(flags, dtype=bool)
    packed = np.packbits(bits)  # pads trailing bits with 0, matching ORC
    return byte_rle_encode(packed)


def bool_rle_decode(data: bytes | np.ndarray, n: int) -> np.ndarray:
    """Decode ORC boolean RLE to a bool array of length n."""
    nbytes = (n + 7) // 8
    packed = byte_rle_decode(data, nbytes)
    return np.unpackbits(packed, count=n).astype(bool)
