"""RLEv1 integer decode (ORC v0 "DIRECT"/"DICTIONARY" encodings,
pre-HIVE-8732 writers, postscript version [0,11]).

Run format [spec]: control byte c in [0,127] -> run of (c+3) values:
next byte is a SIGNED delta (-128..127), then the base value as a
varint (zigzag when the column is signed); value_i = base + i*delta.
c in [128,255] -> literal list of (256-c) varints.

Verified against ORC-Java-written 0.11 files (Spark `orc.write.format=
0.11`) in tests/test_orc_reader.py. Varint terminator positions are
scanned ONCE per stream (not per run) to stay linear.
"""

from __future__ import annotations

import numpy as np

from datafusion_orc_spark.codecs.varint import (
    varint_decode_scalar,
    zigzag_decode,
    zigzag_decode_scalar,
)


def _varints_at(raw: np.ndarray, terms: np.ndarray, pos: int, k: int) -> tuple[np.ndarray, int]:
    """Decode k varints starting at byte pos, using the precomputed
    terminator index (positions of bytes with the high bit clear)."""
    ti = int(np.searchsorted(terms, pos))
    ends = terms[ti : ti + k]
    starts = np.empty(k, dtype=np.int64)
    starts[0] = pos
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(k, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        b = raw[starts[mask] + j].astype(np.uint64)
        out[mask] |= (b & np.uint64(0x7F)) << np.uint64(7 * j)
    return out, int(ends[k - 1]) + 1


def rle_v1_decode(buf: bytes | np.ndarray, n: int, signed: bool = True) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    terms = np.flatnonzero((raw & 0x80) == 0)
    out = np.empty(n, dtype=np.int64)
    filled = 0
    pos = 0
    while filled < n:
        c = int(raw[pos])
        pos += 1
        if c < 128:
            run = c + 3
            delta = int(raw[pos])
            if delta >= 128:
                delta -= 256
            pos += 1
            u, pos = varint_decode_scalar(raw, pos)
            if signed:
                base = zigzag_decode_scalar(u)
            else:
                base = u - (1 << 64) if u >= (1 << 63) else u  # int64 wrap
            # clamp: a bounded decode that enters mid-stream (ROW_INDEX
            # positional seek) may stop inside the final run
            take = min(run, n - filled)
            out[filled : filled + take] = base + delta * np.arange(take, dtype=np.int64)
            filled += take
        else:
            lit = 256 - c
            take = min(lit, n - filled)
            u, pos = _varints_at(raw, terms, pos, lit)
            out[filled : filled + take] = (zigzag_decode(u) if signed else u.view(np.int64))[:take]
            filled += take
    return out
