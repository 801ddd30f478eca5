"""E1/D6 — MSB-first bit packing with the ORC RLEv2 32-entry width table.

Semantics fixed by the ORC v1 spec and verified against ORC-Java-written
streams in SURVEY.md §4.3 (reference corpus: /root/reference/tests/basic/data;
the reference crate delegates decode to orc-rust, Cargo.toml:41).

All kernels are vectorized numpy — values are packed/unpacked via a
(n, width) bit matrix and ``np.packbits``/``np.unpackbits``; no per-value
Python loops.
"""

from __future__ import annotations

import numpy as np

# ORC FixedBitSizes: codes 0..23 -> widths 1..24, then 26,28,30,32,40,48,56,64.
WIDTH_TABLE: tuple[int, ...] = tuple(range(1, 25)) + (26, 28, 30, 32, 40, 48, 56, 64)

_CODE_OF_WIDTH = {w: c for c, w in enumerate(WIDTH_TABLE)}

# closest_fixed_width lookup for 0..64 (0 maps to 1 except delta uses 0 specially)
_CLOSEST = np.zeros(65, dtype=np.int8)
for _w in range(1, 65):
    for _tw in WIDTH_TABLE:
        if _tw >= _w:
            _CLOSEST[_w] = _tw
            break
_CLOSEST[0] = 1


CLOSEST_TABLE = _CLOSEST  # vectorized lookup: CLOSEST_TABLE[raw_width]

# vectorized width -> 5-bit header code (valid only at table widths)
CODE_TABLE = np.full(65, -1, dtype=np.int64)
for _c, _w in enumerate(WIDTH_TABLE):
    CODE_TABLE[_w] = _c


def closest_fixed_width(width: int) -> int:
    """Round a bit width up to the nearest entry in the RLEv2 width table."""
    return int(_CLOSEST[width])


def width_code(width: int) -> int:
    """5-bit header code for an (already table-aligned) width."""
    return _CODE_OF_WIDTH[width]


def decode_width(code: int) -> int:
    """Inverse of :func:`width_code`."""
    return WIDTH_TABLE[code]


def bits_required(vals: np.ndarray) -> int:
    """Max number of bits needed to represent any value (unsigned view)."""
    if len(vals) == 0:
        return 1
    m = int(np.max(vals.view(np.uint64) if vals.dtype == np.int64 else vals.astype(np.uint64)))
    return max(1, m.bit_length())


def bit_widths(vals: np.ndarray) -> np.ndarray:
    """Per-value bit widths (unsigned), vectorized. 0-valued entries -> 1.

    Branchless binary search: elementwise shift by a computed per-value
    amount (no boolean fancy indexing — ~5x faster at 1M values).
    uint32 input runs a 32-bit pipeline (half the memory traffic).
    """
    if vals.dtype == np.uint32:
        # exact fast path: float64 holds every uint32 exactly, and the
        # frexp exponent of x>0 IS bit_length(x) — 2 passes instead of 5
        # shift/compare/accumulate rounds (~6x faster at 8M values)
        e = np.frexp(vals.astype(np.float64))[1]
        return np.maximum(e.astype(np.int64), 1)
    dt, shifts = np.uint64, (32, 16, 8, 4, 2, 1)
    x = vals.astype(np.uint64, copy=True)
    w = np.zeros(len(x), dtype=dt)
    for shift in shifts:
        m = (x >= (dt(1) << dt(shift))).astype(dt) * dt(shift)
        w += m
        x >>= m
    return np.maximum(w.astype(np.int64) + 1, 1)


def bit_pack(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned values MSB-first at ``width`` bits each.

    Mirrors ORC writeInts/bit-packing (D6 evidence: DIRECT runs in the
    §4.3 dumps are byte-exact under this layout).

    Implementation: big-endian byte view -> np.unpackbits -> take the
    low ``width`` bit columns -> np.packbits. Measured against a 40-bit
    OR-scatter window kernel and a per-phase strided kernel on this
    hardware: packbits wins or ties at every width (it is SIMD inside),
    so the bit-matrix stays. (The strided window DOES win for unpack —
    see _unpack_window.)
    """
    n = len(vals)
    if n == 0:
        return b""
    if vals.dtype == np.uint32 and width <= 32:
        u = np.ascontiguousarray(vals)
        isz = 4
    else:
        u = np.ascontiguousarray(vals, dtype=np.uint64)
        isz = 8
    wb = (width + 7) // 8  # only touch the low ceil(w/8) bytes per value
    # little-endian byte view reversed = big-endian low bytes, no byteswap pass
    if width % 8 == 0:  # byte-aligned width: the bytes ARE the packing
        if width in (8, 16, 32, 64):
            # vectorized byteswap astype + contiguous tobytes: ~4x over
            # the strided-view tobytes (this path carries token streams)
            be = {8: np.uint8, 16: ">u2", 32: ">u4", 64: ">u8"}[width]
            return u.astype(be).tobytes()
        # tobytes() on the strided view copies once (ascontiguousarray +
        # tobytes would copy twice)
        return u.view(np.uint8).reshape(n, isz)[:, wb - 1 :: -1].tobytes()
    be = np.ascontiguousarray(u.view(np.uint8).reshape(n, isz)[:, wb - 1 :: -1])
    bits = np.unpackbits(be.reshape(-1)).reshape(n, wb * 8)
    bits = np.ascontiguousarray(bits[:, wb * 8 - width :])
    return np.packbits(bits.reshape(-1)).tobytes()


def bit_pack_view(vals: np.ndarray, width: int) -> bytes | memoryview:
    """bit_pack that may return a memoryview instead of bytes.

    For byte-aligned power-of-two widths (the token-stream hot path) the
    big-endian ``astype`` array IS the packed stream — returning its
    buffer skips the ``tobytes()`` copy (one full read+write of the
    packed stream per stripe). Only for callers that treat the result as
    an opaque buffer (len / join / slice); callers that concatenate with
    ``bytes +`` need bit_pack."""
    n = len(vals)
    if n and width in (8, 16, 32, 64):
        if vals.dtype == np.uint32 and width <= 32:
            u = np.ascontiguousarray(vals)
        else:
            u = np.ascontiguousarray(vals, dtype=np.uint64)
        be = {8: np.uint8, 16: ">u2", 32: ">u4", 64: ">u8"}[width]
        # uint8 view first so len(memoryview) == byte count (a '>u2'
        # view would report element count and corrupt stream headers)
        return u.astype(be).view(np.uint8).data
    return bit_pack(vals, width)


def bit_unpack(buf: bytes | np.ndarray, width: int, n: int, offset_bits: int = 0) -> np.ndarray:
    """Unpack ``n`` unsigned values of ``width`` bits, MSB-first.

    ``offset_bits`` allows reading from a mid-byte position (used by the
    PATCHED_BASE patch-list parser).
    """
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    wb = (width + 7) // 8
    if width % 8 == 0 and offset_bits % 8 == 0:  # byte-aligned fast path
        o = offset_bits // 8
        if width in (8, 16, 32, 64):
            # one big-endian view + astype (vectorized byteswap) instead
            # of wb strided column gathers — ~10x on the w=16 token path
            be = {8: np.uint8, 16: ">u2", 32: ">u4", 64: ">u8"}[width]
            return raw[o : o + n * wb].view(be).astype(np.uint64)
        packed = raw[o : o + n * wb].reshape(n, wb)
    elif 9 <= width < 32:
        return _unpack_window(raw, width, n, offset_bits)
    else:
        total_bits = offset_bits + n * width
        nbytes = (total_bits + 7) // 8
        bits = np.unpackbits(raw[:nbytes])[offset_bits : offset_bits + n * width]
        padded = np.zeros((n, wb * 8), dtype=np.uint8)
        padded[:, wb * 8 - width :] = bits.reshape(n, width)
        packed = np.packbits(padded.reshape(-1)).reshape(n, wb)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(wb):  # <=8 cheap vector passes
        out = (out << np.uint64(8)) | packed[:, j].astype(np.uint64)
    return out


def _unpack_window(raw: np.ndarray, width: int, n: int, offset_bits: int) -> np.ndarray:
    """Non-byte-aligned width 9..31, any bit offset: values whose index
    is congruent mod 8 share a bit phase and sit exactly ``width`` bytes
    apart, so each phase group reads a constant-shift (m, 5)-byte
    strided window (w+7 <= 38 bits fits the 40-bit window), fuses it to
    uint64, shifts and masks. 8 groups x 5 strided column reads — no
    index arrays, no bit expansion; measured ~1.3-2x faster than the
    unpackbits matrix at w>=11 on this hardware."""
    from numpy.lib.stride_tricks import as_strided

    # pad so the 5-byte window of the LAST value is in-bounds
    need = ((offset_bits + (n - 1) * width) >> 3) + 5
    pad = np.zeros(need, dtype=np.uint8)
    m0 = min(len(raw), need)
    pad[:m0] = raw[:m0]
    out = np.empty(n, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    for r in range(8):
        m = len(range(r, n, 8))
        if m == 0:
            break
        start_bit = offset_bits + r * width
        b0 = start_bit >> 3
        sh = np.uint64(40 - width - (start_bit & 7))
        win = as_strided(pad[b0:], shape=(m, 5), strides=(width, 1))
        acc = win[:, 0].astype(np.uint64)
        for j in range(1, 5):
            acc = (acc << np.uint64(8)) | win[:, j]
        out[r::8] = (acc >> sh) & mask
    return out
