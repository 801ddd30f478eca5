"""RUN+FoR — long-run extraction + frame-of-reference literals with an
optional PFOR exception list. Part of OUR stripe format (not ORC).

Why it exists: RLEv2 pays a 2-byte header per 512-value chunk and its
writer fragments into per-segment work at every embedded run; on token
streams where ~15-20% of values sit in long boilerplate runs this codec
is both SMALLER (runs cost ~0 bits/value, literals pay exact FoR width,
no chunk headers) and ~5x faster to encode, because every step is one
whole-array numpy pass:

  runs >= MIN_RUN values  ->  (positions, lengths, values) side lists,
                              each RLEv2-compressed (tiny)
  all other values        ->  FoR base-subtracted, bit-packed at width
                              w chosen from the width histogram; values
                              wider than w become PFOR exceptions
                              (positions RLEv2, high bits bit-packed)

Decode is the mirror image: bit_unpack literals, np.repeat the runs,
and interleave through a coverage mask — three vector passes.
"""

from __future__ import annotations

import numpy as np

from datafusion_orc_spark.codecs.bitpack import (
    bit_pack,
    bit_unpack,
    bit_widths,
    closest_fixed_width,
)
from datafusion_orc_spark.codecs.pfor import choose_pfor_width
from datafusion_orc_spark.codecs.rlev2 import rle_v2_decode, rle_v2_encode
from datafusion_orc_spark.codecs.varint import (
    varint_decode_scalar,
    varint_encode_scalar,
    zigzag_decode_scalar,
    zigzag_scalar,
)

MIN_RUN = 32

# stream keys within the returned dict
META, LIT, RUN_POS, RUN_LEN, RUN_VAL, EXC_POS, EXC_HIGH = range(7)


def _coverage_mask(n: int, r_pos: np.ndarray, r_len: np.ndarray) -> np.ndarray:
    delta = np.zeros(n + 1, dtype=np.int32)
    np.add.at(delta, r_pos, 1)
    np.add.at(delta, r_pos + r_len, -1)
    return np.cumsum(delta[:n]).astype(bool)


def runfor_encode(vals: np.ndarray) -> dict[int, bytes]:
    """int array -> stream dict (keys above; absent = empty)."""
    n = len(vals)
    v = np.ascontiguousarray(vals)
    if n == 0:
        return {META: varint_encode_scalar(0) + varint_encode_scalar(0)}

    # maximal equal-value runs >= MIN_RUN, found WITHOUT materializing all
    # run boundaries: cand[i] = (v[i] == v[i+MIN_RUN-1]) is true on exactly
    # [s, s+L-MIN_RUN] for a maximal run [s, s+L) of length L >= MIN_RUN
    # (maximality makes the positions just outside false), so contiguous
    # cand blocks ARE the long runs — one vector compare instead of a
    # full segmentation pass, and run-free data bails immediately.
    # Periodic data can create accidental blocks; a constancy check over
    # just the covered values drops those (correctness never depends on
    # run extraction — uncaptured equal values simply stay literals).
    m = MIN_RUN - 1
    r_pos = r_len = np.empty(0, dtype=np.int64)
    if n >= MIN_RUN:
        cand = v[m:] == v[:-m]
        z = np.flatnonzero(cand)
        if len(z):
            brk = np.flatnonzero(np.diff(z) > 1)
            blk_s = np.concatenate(([0], brk + 1))
            blk_e = np.append(brk, len(z) - 1)
            # chance matches (v[i] == v[i+31] without a run) are common on
            # skewed data and would make the verification gather O(n);
            # require >=3 contiguous cand positions (true runs >= MIN_RUN+2)
            keep = (blk_e - blk_s) >= 2
            blk_s, blk_e = blk_s[keep], blk_e[keep]
            r_pos = z[blk_s].astype(np.int64)
            r_len = (z[blk_e] + m + 1 - r_pos).astype(np.int64)
            # verify constancy of each block (vectorized gather + reduceat)
            offs = np.zeros(len(r_pos), dtype=np.int64)
            np.cumsum(r_len[:-1], out=offs[1:])
            gather = np.repeat(r_pos - offs, r_len) + np.arange(int(r_len.sum()))
            eq = v[gather] == np.repeat(v[r_pos], r_len)
            ok = np.minimum.reduceat(eq, offs) if len(offs) else np.empty(0, bool)
            r_pos, r_len = r_pos[ok], r_len[ok]

    if len(r_pos):
        lit = v[~_coverage_mask(n, r_pos, r_len)]
    else:
        lit = v
    n_lit = len(lit)

    streams: dict[int, bytes] = {}
    if len(r_pos):
        streams[RUN_POS] = rle_v2_encode(r_pos, signed=False)
        streams[RUN_LEN] = rle_v2_encode(r_len, signed=False)
        streams[RUN_VAL] = rle_v2_encode(v[r_pos].astype(np.int64), signed=True)

    base = int(lit.min()) if n_lit else 0
    w = wm = 1
    n_exc = 0
    if n_lit:
        u_dt = np.uint32 if lit.dtype == np.int32 else np.uint64
        with np.errstate(over="ignore"):
            reduced = (lit - lit.dtype.type(base)).view(u_dt)
        # width choice from a 1-in-16 SAMPLE histogram (a slightly
        # off-optimal w only costs size, never correctness — exceptions
        # absorb every value >= 2^w); wm comes from the exact max
        wm = closest_fixed_width(max(1, int(reduced.max()).bit_length()))
        sample = reduced[::16] if n_lit > 65536 else reduced
        widths = bit_widths(sample)
        w, _bits = choose_pfor_width(widths, wm)
        if w < wm:
            exc_mask = reduced >= u_dt(1 << w) if w < 8 * reduced.dtype.itemsize else np.zeros(n_lit, bool)
            n_exc = int(exc_mask.sum())
            if not n_exc:
                w = wm  # sample saw outliers the full data lacks
            mask = u_dt((1 << w) - 1) if w < reduced.dtype.itemsize * 8 else ~u_dt(0)
            streams[LIT] = bit_pack(reduced & mask, w)
            streams[EXC_POS] = rle_v2_encode(np.flatnonzero(exc_mask).astype(np.int64), signed=False)
            streams[EXC_HIGH] = bit_pack((reduced[exc_mask] >> u_dt(w)).astype(np.uint64), wm - w)
        else:
            w = wm
            streams[LIT] = bit_pack(reduced, w)

    streams[META] = (
        varint_encode_scalar(len(r_pos))
        + varint_encode_scalar(n_lit)
        + varint_encode_scalar(zigzag_scalar(base))
        + varint_encode_scalar(w)
        + varint_encode_scalar(wm)
        + varint_encode_scalar(n_exc)
    )
    return streams


def runfor_size(streams: dict[int, bytes]) -> int:
    return sum(len(b) for b in streams.values())


def runfor_decode(streams: dict[int, bytes], n: int) -> np.ndarray:
    meta = np.frombuffer(streams[META], dtype=np.uint8)
    n_runs, p = varint_decode_scalar(meta, 0)
    n_lit, p = varint_decode_scalar(meta, p)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    zz, p = varint_decode_scalar(meta, p)
    base = zigzag_decode_scalar(zz)
    w, p = varint_decode_scalar(meta, p)
    wm, p = varint_decode_scalar(meta, p)
    n_exc, p = varint_decode_scalar(meta, p)

    if n_lit:
        lit = bit_unpack(streams[LIT], w, n_lit)
        if n_exc:
            pos = rle_v2_decode(streams[EXC_POS], n_exc, signed=False)
            high = bit_unpack(streams[EXC_HIGH], wm - w, n_exc)
            lit[pos] |= high << np.uint64(w)
        lit = lit.view(np.int64) + base
    else:
        lit = np.empty(0, dtype=np.int64)

    if not n_runs:
        return lit
    r_pos = rle_v2_decode(streams[RUN_POS], n_runs, signed=False)
    r_len = rle_v2_decode(streams[RUN_LEN], n_runs, signed=False)
    r_val = rle_v2_decode(streams[RUN_VAL], n_runs, signed=True)
    out = np.empty(n, dtype=np.int64)
    covered = _coverage_mask(n, r_pos, r_len)
    out[covered] = np.repeat(r_val, r_len)
    out[~covered] = lit
    return out
