"""PFOR — patched frame-of-reference with UNLIMITED exceptions.

ORC's PATCHED_BASE caps the patch list at 31 entries per 512-value run,
so skewed (Zipf) token distributions with ~10% wide values fall back to
full-width DIRECT. This codec (part of OUR stripe format, not ORC)
removes the cap (Zukowski et al., "Super-Scalar RAM-CPU Cache
Compression", ICDE 2006 — the PFOR family):

    META     varints: base (zigzag), low width w, max width wm, n_exc
    DATA     all values' low w bits, bit-packed (exceptions keep their
             low bits in place)
    EXC_POS  ascending exception positions, RLEv2 unsigned (delta runs)
    EXC_HIGH exceptions' high (wm - w) bits, bit-packed

The width w is chosen from the full width histogram to minimize
n*w + n_exc*((wm - w) + pos_cost). Everything is vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from datafusion_orc_spark.codecs.bitpack import (
    bit_pack,
    bit_unpack,
    bit_widths,
    closest_fixed_width,
)
from datafusion_orc_spark.codecs.rlev2 import rle_v2_decode, rle_v2_encode
from datafusion_orc_spark.codecs.varint import (
    varint_decode_scalar,
    varint_encode_scalar,
    zigzag_decode_scalar,
    zigzag_scalar,
)

_POS_COST_BITS = 5  # amortized bits per exception position (RLEv2 of the
# ascending position list measures ~4.6 bits/exception at 10-40% density)


def choose_pfor_width(widths: np.ndarray, wm: int) -> tuple[int, int]:
    """-> (w, estimated total bits). widths = per-value bit widths of the
    base-subtracted values; wm = closest_fixed(max width)."""
    n = len(widths)
    hist = np.bincount(widths, minlength=wm + 1)
    cum = np.cumsum(hist)
    best_w, best_bits = wm, n * wm
    for w in range(1, wm):
        n_exc = n - int(cum[w])
        bits = n * w + n_exc * ((wm - w) + _POS_COST_BITS)
        if bits < best_bits:
            best_w, best_bits = w, bits
    return best_w, best_bits


def pfor_encode(vals: np.ndarray) -> tuple[bytes, bytes, bytes, bytes] | None:
    """-> (meta, data, exc_pos, exc_high) or None when plain packing at
    the max width is already optimal (caller should use RLEv2/FoR)."""
    n = len(vals)
    if n == 0:
        return None
    base = int(vals.min())
    u_dt = np.uint32 if vals.dtype == np.int32 else np.uint64
    with np.errstate(over="ignore"):
        reduced = (vals - vals.dtype.type(base)).view(u_dt)
    widths = bit_widths(reduced)
    wm = closest_fixed_width(int(widths.max()))
    w, _bits = choose_pfor_width(widths, wm)
    if w >= wm:
        return None
    pos = np.flatnonzero(widths > w).astype(np.int64)
    n_exc = len(pos)
    # bit_pack truncates to ``w`` bits itself — no masking copy needed
    data = bit_pack(reduced, w)
    exc_pos = rle_v2_encode(pos, signed=False)
    high = (reduced[pos] >> u_dt(w)).astype(np.uint64)
    exc_high = bit_pack(high, wm - w)
    meta = (
        varint_encode_scalar(zigzag_scalar(base))
        + varint_encode_scalar(w)
        + varint_encode_scalar(wm)
        + varint_encode_scalar(n_exc)
    )
    return meta, data, exc_pos, exc_high


def pfor_decode(meta: bytes, data: bytes, exc_pos: bytes, exc_high: bytes, n: int) -> np.ndarray:
    zz, p = varint_decode_scalar(np.frombuffer(meta, dtype=np.uint8), 0)
    base = zigzag_decode_scalar(zz)
    raw = np.frombuffer(meta, dtype=np.uint8)
    w, p = varint_decode_scalar(raw, p)
    wm, p = varint_decode_scalar(raw, p)
    n_exc, p = varint_decode_scalar(raw, p)
    out = bit_unpack(data, w, n)
    if n_exc:
        pos = rle_v2_decode(exc_pos, n_exc, signed=False)
        high = bit_unpack(exc_high, wm - w, n_exc)
        out[pos] |= high << np.uint64(w)
    return out.view(np.int64) + base
