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
    """Per-value bit widths (unsigned), vectorized. 0-valued entries -> 1."""
    u = vals.astype(np.uint64, copy=False)
    w = np.zeros(len(u), dtype=np.int64)
    x = u.copy()
    shift = 32
    while shift:
        mask = x >= (np.uint64(1) << np.uint64(shift))
        w[mask] += shift
        x[mask] >>= np.uint64(shift)
        shift //= 2
    return np.maximum(w + 1, 1)


def bit_pack(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned values MSB-first at ``width`` bits each.

    Mirrors ORC writeInts/bit-packing (D6 evidence: DIRECT runs in the
    §4.3 dumps are byte-exact under this layout).
    """
    n = len(vals)
    if n == 0:
        return b""
    u = vals.astype(np.uint64, copy=False)
    # (n, width) bit matrix, MSB first within each value.
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((u[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def bit_unpack(buf: bytes | np.ndarray, width: int, n: int, offset_bits: int = 0) -> np.ndarray:
    """Unpack ``n`` unsigned values of ``width`` bits, MSB-first.

    ``offset_bits`` allows reading from a mid-byte position (used by the
    PATCHED_BASE patch-list parser).
    """
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    total_bits = offset_bits + n * width
    nbytes = (total_bits + 7) // 8
    bits = np.unpackbits(raw[:nbytes])[offset_bits : offset_bits + n * width]
    mat = bits.reshape(n, width).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    return mat @ weights
