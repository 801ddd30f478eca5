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
    bit_pack_view,
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
    # int8 end-to-end: runs are disjoint so nesting never exceeds 1, and
    # cumsum(dtype=int8) + view(bool) keeps this at ~3n bytes of traffic
    # (the int32+astype version moved ~12n and dominated the encode's
    # memory-bus footprint — the 2->8 scaling bottleneck)
    delta = np.zeros(n + 1, dtype=np.int8)
    np.add.at(delta, r_pos, 1)
    np.add.at(delta, r_pos + r_len, -1)
    return np.cumsum(delta[:n], dtype=np.int8).view(bool)


def sorted_pos_encode(pos: np.ndarray) -> bytes:
    """Strictly-increasing int64 positions -> varint(first) + u8 width +
    bit-packed gaps. One vector pass — replaces the RLEv2 side-list
    encoding whose per-512-window python loop dominated run/exception
    heavy stripes."""
    if len(pos) == 0:
        return b""
    first = int(pos[0])
    gaps = np.diff(pos).view(np.uint64)
    w = closest_fixed_width(max(1, int(gaps.max()).bit_length())) if len(gaps) else 1
    return varint_encode_scalar(first) + bytes([w]) + bit_pack(gaps, w)


def sorted_pos_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    first, p = varint_decode_scalar(raw, 0)
    w = int(raw[p])
    gaps = bit_unpack(raw[p + 1 :], w, n - 1)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(gaps.view(np.int64), out=out[1:])
    out[1:] += first
    return out


# per-process literal scratch (one per dtype): reused across stripes so
# the gap-slice concatenate writes into already-faulted pages. Safe:
# Spark python workers run one task at a time, and the literal view is
# fully consumed (bit-packed) before runfor_encode returns.
_LIT_SCRATCH: dict[str, np.ndarray] = {}


def _lit_scratch(dtype: np.dtype, n: int) -> np.ndarray:
    buf = _LIT_SCRATCH.get(dtype.char)
    if buf is None or len(buf) < n:
        buf = np.empty(max(n, int(n * 1.25)), dtype=dtype)
        _LIT_SCRATCH[dtype.char] = buf
    return buf[:n]


def runfor_encode(
    vals: np.ndarray, vmin: int | None = None, vmax: int | None = None
) -> dict[int, bytes]:
    """int array -> stream dict (keys above; absent = empty).

    ``vmin``/``vmax``: optional precomputed column min/max (the stripe
    stats pass already has them) — saves two full-array reductions; any
    vmin <= min(vals) / vmax >= max(vals) is correct (FoR base need only
    be a lower bound; width only an upper bound)."""
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

    if len(r_pos) == 0:
        lit = v
    elif len(r_pos) <= 4096:
        # few long runs (the token-stream shape): literals are the gap
        # slices between runs — one np.concatenate memcpy instead of a
        # coverage mask + invert + boolean fancy-select (3 full passes).
        # The copy lands in a REUSED per-process scratch buffer: a fresh
        # ~100 MB allocation per stripe pays first-touch page faults on
        # every call (the dominant cost of this phase on ballooned
        # hosts); warm scratch pages stay mapped across stripes.
        segs = []
        pos = 0
        for p, ln in zip(r_pos.tolist(), r_len.tolist()):
            if p > pos:
                segs.append(v[pos:p])
            pos = p + ln
        if pos < n:
            segs.append(v[pos:])
        if segs:
            n_gap = n - int(r_len.sum())
            lit = np.concatenate(segs, out=_lit_scratch(v.dtype, n_gap))
        else:
            lit = v[:0]
    else:
        lit = v[~_coverage_mask(n, r_pos, r_len)]
    n_lit = len(lit)

    streams: dict[int, bytes] = {}
    if len(r_pos):
        streams[RUN_POS] = sorted_pos_encode(r_pos)
        streams[RUN_LEN] = rle_v2_encode(r_len, signed=False)
        streams[RUN_VAL] = rle_v2_encode(v[r_pos].astype(np.int64), signed=True)

    base = int(vmin) if vmin is not None else (int(lit.min()) if n_lit else 0)
    w = wm = 1
    n_exc = 0
    if n_lit:
        u_dt = np.uint32 if lit.dtype == np.int32 else np.uint64
        if base == 0:
            # all-non-negative with base 0: the unsigned view IS the
            # reduced array — skips a full subtract+write pass (token
            # streams always take this branch)
            reduced = lit.view(u_dt)
        else:
            with np.errstate(over="ignore"):
                reduced = (lit - lit.dtype.type(base)).view(u_dt)
        # width choice from a 1-in-16 SAMPLE histogram (a slightly
        # off-optimal w only costs size, never correctness — exceptions
        # absorb every value >= 2^w); wm comes from the exact max (or the
        # caller's column max, an upper bound — avoids another pass)
        if vmax is not None and vmin is not None:
            wm = closest_fixed_width(max(1, (int(vmax) - base).bit_length()))
        else:
            wm = closest_fixed_width(max(1, int(reduced.max()).bit_length()))
        sample = reduced[::16] if n_lit > 65536 else reduced
        widths = bit_widths(sample)
        w, _bits = choose_pfor_width(widths, wm)
        if w < wm:
            # one pass: flatnonzero(compare) replaces the old
            # mask-then-sum-then-flatnonzero-then-boolean-gather chain
            # (three full scans of the bool temp); bit_pack itself
            # truncates to ``w`` bits in every layout path, so the old
            # ``reduced & mask`` copy (r+w of the whole literal array)
            # was pure waste — dropped (r7 scaling fix)
            exc_idx = (
                np.flatnonzero(reduced >= u_dt(1 << w))
                if w < 8 * reduced.dtype.itemsize
                else np.empty(0, dtype=np.int64)
            )
            n_exc = len(exc_idx)
            if not n_exc:
                w = wm  # sample saw outliers the full data lacks
            streams[LIT] = bit_pack_view(reduced, w)
            if n_exc:
                streams[EXC_POS] = sorted_pos_encode(exc_idx.astype(np.int64))
                streams[EXC_HIGH] = bit_pack((reduced[exc_idx] >> u_dt(w)).astype(np.uint64), wm - w)
        else:
            w = wm
            streams[LIT] = bit_pack_view(reduced, w)

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


def runfor_decode_range(streams: dict[int, bytes], n: int, start: int, stop: int) -> np.ndarray:
    """Decode only rows [start, stop) — the D19 sub-block fast path.

    Fixed-width literals are seekable by bit arithmetic: the literal
    index of row r is r minus the run coverage before r, so the range's
    literals are one ranged ``bit_unpack`` at offset_bits = la*w instead
    of a full-stream decode. Run side lists are tiny and decoded whole.
    Exactly equal to runfor_decode(...)[start:stop].
    """
    start, stop = max(0, int(start)), min(int(n), int(stop))
    m = stop - start
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    meta = np.frombuffer(streams[META], dtype=np.uint8)
    n_runs, p = varint_decode_scalar(meta, 0)
    n_lit, p = varint_decode_scalar(meta, p)
    zz, p = varint_decode_scalar(meta, p)
    base = zigzag_decode_scalar(zz)
    w, p = varint_decode_scalar(meta, p)
    wm, p = varint_decode_scalar(meta, p)
    n_exc, p = varint_decode_scalar(meta, p)

    if n_runs:
        r_pos = sorted_pos_decode(streams[RUN_POS], n_runs)
        r_len = rle_v2_decode(streams[RUN_LEN], n_runs, signed=False)
        r_val = rle_v2_decode(streams[RUN_VAL], n_runs, signed=True)
        r_end = r_pos + r_len
        # run coverage before a row r: sum over runs of overlap with [0, r)
        cov = lambda r: int(np.minimum(np.maximum(r - r_pos, 0), r_len).sum())  # noqa: E731
    else:
        r_pos = r_len = r_val = r_end = np.empty(0, dtype=np.int64)
        cov = lambda r: 0  # noqa: E731

    la, lb = start - cov(start), stop - cov(stop)
    if lb > la:
        lit = bit_unpack(streams[LIT], w, lb - la, offset_bits=la * w)
        if n_exc:
            epos = sorted_pos_decode(streams[EXC_POS], n_exc)
            e0, e1 = np.searchsorted(epos, la), np.searchsorted(epos, lb)
            if e1 > e0:
                high = bit_unpack(streams[EXC_HIGH], wm - w, e1 - e0, offset_bits=e0 * (wm - w))
                lit[epos[e0:e1] - la] |= high << np.uint64(w)
        lit = lit.view(np.int64)
        if base:
            lit += base
    else:
        lit = np.empty(0, dtype=np.int64)

    if not n_runs:
        return lit
    # clip runs to the window and reassemble locally
    sel = (r_pos < stop) & (r_end > start)
    c_pos = np.maximum(r_pos[sel], start) - start
    c_len = np.minimum(r_end[sel], stop) - start - c_pos
    out = np.empty(m, dtype=np.int64)
    covered = _coverage_mask(m, c_pos, c_len)
    out[covered] = np.repeat(r_val[sel], c_len)
    out[~covered] = lit
    return out


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
            pos = sorted_pos_decode(streams[EXC_POS], n_exc)
            high = bit_unpack(streams[EXC_HIGH], wm - w, n_exc)
            lit[pos] |= high << np.uint64(w)
        lit = lit.view(np.int64)
        if base:
            lit += base
    else:
        lit = np.empty(0, dtype=np.int64)

    if not n_runs:
        return lit
    r_pos = sorted_pos_decode(streams[RUN_POS], n_runs)
    r_len = rle_v2_decode(streams[RUN_LEN], n_runs, signed=False)
    r_val = rle_v2_decode(streams[RUN_VAL], n_runs, signed=True)
    out = np.empty(n, dtype=np.int64)
    if n_runs <= 4096:
        # few runs (the token-stream shape: runs are LONG, so there are
        # not many): literal gaps are contiguous in BOTH lit and out, so
        # assembly is 2 slice memcpys per run — ~6x faster than the
        # coverage-mask + two masked-scatter passes over all n values
        pos = lo = 0
        for p, ln, v in zip(r_pos.tolist(), r_len.tolist(), r_val.tolist()):
            gap = p - pos
            if gap:
                out[pos:p] = lit[lo : lo + gap]
                lo += gap
            out[p : p + ln] = v
            pos = p + ln
        if pos < n:
            out[pos:] = lit[lo:]
        return out
    covered = _coverage_mask(n, r_pos, r_len)
    out[covered] = np.repeat(r_val, r_len)
    out[~covered] = lit
    return out
