"""Pure-python LZO1X block codec (ORC compression kind 3).

Why this exists: no LZO library ships in this environment (pyarrow has no
LZO codec), yet LZO is a legal ORC v1 compression kind, so foreign files
written with `orc.compress=LZO` were previously rejected with a generic
NotImplementedError. This implements the public LZO1X *stream* format —
the instruction encoding is documented in the Linux kernel's
Documentation/staging/lzo.rst and the reference lzo1x decompressor — from
that public description. Sequential by nature; used only on the LZO-ORC
read/write path (chunks bounded by compressionBlockSize, <= 256 KiB), not
in any hot loop.

Instruction classes (t = opcode byte):
  t in 0..15   state-dependent:
    state==0  long literal run, length = 3 + (t or 15 + 255*zeros + nz)
    state 1-3 2-byte match, dist = (H << 2) + (t >> 2) + 1       [+1 byte H]
    state==4  3-byte match, dist = (H << 2) + (t >> 2) + 2049    [+1 byte H]
  t in 16..31  match, len = 2 + ((t & 7) or 7 + ext), 16..48 kB:
               dist = 16384 + ((t & 8) << 11) + (v >> 2)         [+2 byte v, LE]
               dist == 16384 -> end of stream (canonical 0x11 0x00 0x00)
  t in 32..63  match, len = 2 + ((t & 31) or 31 + ext), dist = (v >> 2) + 1
  t in 64..127 match, len = 3 + ((t >> 5) & 1), dist = (H << 3) + ((t >> 2) & 7) + 1
  t in 128..255 match, len = 5 + ((t >> 5) & 3), dist as above
After every match, S = low 2 bits of the last instruction byte (or of v)
literals follow inline; S becomes the state for the next opcode. A first
byte > 17 is an initial literal run of (byte - 17).

The compressor emits only state-unambiguous opcode classes (initial-run /
long-run literals, M3 32..63 for dist <= 16 kB, M4 16..31 beyond) with a
4-byte-hash greedy matcher — valid LZO1X any decompressor accepts, not
byte-identical to lzo1x_1's output (it trades a little ratio for
simplicity; this path is conformance, not throughput).
"""

from __future__ import annotations


def lzo1x_decompress(src: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    state = 0

    def take_literals(count: int) -> None:
        nonlocal i
        if i + count > n:
            raise ValueError(
                f"lzo: truncated literal run (need {count} bytes at {i}, have {n - i})"
            )
        out.extend(src[i : i + count])
        i += count

    def copy_match(dist: int, length: int) -> None:
        start = len(out) - dist
        if start < 0:
            raise ValueError(f"lzo: match distance {dist} before output start")
        if dist >= length:
            out.extend(out[start : start + length])
        else:  # overlapping match: byte-wise copy semantics
            for k in range(length):
                out.append(out[start + k])

    def extended(base: int) -> int:
        # length extension: base + 255 per zero byte + final non-zero byte
        nonlocal i
        length = base
        while i < n and src[i] == 0:
            length += 255
            i += 1
        if i >= n:
            raise ValueError("lzo: truncated length extension")
        length += src[i]
        i += 1
        return length

    if n == 0:
        return b""
    first = src[0]
    if first > 17:
        # initial literal run (reference decompressor: `if (*ip > 17)`);
        # 17 itself is a normal opcode — e.g. an empty stream is just the
        # EOS marker 0x11 0x00 0x00
        i = 1
        t = first - 17
        take_literals(t)
        state = 4 if t >= 4 else t

    while True:
        if i >= n:
            raise ValueError("lzo: stream ended without end-of-stream marker")
        t = src[i]
        i += 1
        if t < 16:
            if state == 0:
                length = (t + 3) if t else (extended(15) + 3)
                take_literals(length)
                state = 4
                continue
            if i >= n:
                raise ValueError("lzo: truncated match byte")
            h = src[i]
            i += 1
            if state == 4:
                copy_match((h << 2) + (t >> 2) + 2049, 3)
            else:  # state 1..3
                copy_match((h << 2) + (t >> 2) + 1, 2)
        elif t < 32:
            length = (t & 7) + 2 if (t & 7) else extended(7) + 2
            if i + 2 > n:
                raise ValueError("lzo: truncated M4 distance")
            v = src[i] | (src[i + 1] << 8)
            i += 2
            dist = 16384 + ((t & 8) << 11) + (v >> 2)
            if dist == 16384:
                if length != 3:
                    raise ValueError("lzo: bad end-of-stream marker length")
                return bytes(out)
            copy_match(dist, length)
            t = v  # S bits live in the LE16 low byte
        elif t < 64:
            length = (t & 31) + 2 if (t & 31) else extended(31) + 2
            if i + 2 > n:
                raise ValueError("lzo: truncated M3 distance")
            v = src[i] | (src[i + 1] << 8)
            i += 2
            copy_match((v >> 2) + 1, length)
            t = v
        else:
            length = (3 + ((t >> 5) & 1)) if t < 128 else (5 + ((t >> 5) & 3))
            if i >= n:
                raise ValueError("lzo: truncated M2 distance byte")
            h = src[i]
            i += 1
            copy_match((h << 3) + ((t >> 2) & 7) + 1, length)
        state = t & 3
        take_literals(state)


_MAX_DIST = 49151  # M4 ceiling: 16384 + (1 << 14) + (1 << 14) - 1


def _emit_long_run(out: bytearray, src: bytes, start: int, length: int) -> None:
    """state==0 literal run (length >= 4), unbounded via zero extension."""
    if length <= 18:
        out.append(length - 3)
    else:
        out.append(0)
        rem = length - 18
        zeros, last = divmod(rem - 1, 255)
        out.extend(b"\x00" * zeros)
        out.append(last + 1)
    out.extend(src[start : start + length])


def lzo1x_compress(src: bytes) -> bytes:
    """Greedy LZO1X compressor over a 4-byte hash chain (window 48 kB,
    min match 4). Output parses under any conforming LZO1X decompressor;
    see module docstring for the opcode subset emitted."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out.extend(b"\x11\x00\x00")
        return bytes(out)

    table: dict[bytes, int] = {}
    ops: list[tuple[int, int, int, int]] = []  # (lit_start, lit_len, dist, mlen)
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_DIST:
            mlen = 4
            limit = n - i
            while mlen < limit and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            gap = i - lit_start
            # a gap of exactly 1..3 after ANOTHER gap>=0 is fine (S bits);
            # but a FIRST-op gap of 0 with nothing before is also fine
            ops.append((lit_start, gap, i - cand, mlen))
            # index positions inside the match (bounded: tests/chunks <=256k)
            for j in range(i + 1, min(i + mlen, n - 3)):
                table[src[j : j + 4]] = j
            i += mlen
            lit_start = i
        else:
            i += 1
    tail = n - lit_start

    # serialize with explicit literal-state tracking
    first = True
    k = 0
    while k <= len(ops):
        is_tail = k == len(ops)
        if is_tail:
            start, lits, dist, mlen = lit_start, tail, 0, 0
        else:
            start, lits, dist, mlen = ops[k]
        # --- literals ---
        inline_s = 0
        if lits:
            if first:
                if lits <= 3:
                    out.append(17 + lits)  # initial short run, state=lits
                    out.extend(src[start : start + lits])
                elif lits <= 238:
                    out.append(17 + lits)  # initial run byte covers 4..238
                    out.extend(src[start : start + lits])
                else:
                    _emit_long_run(out, src, start, lits)
            elif lits <= 3:
                # impossible by construction: 1..3-byte gaps are consumed
                # into the previous match's S bits before we get here
                raise AssertionError("short literal gap escaped S-bit consumption")
            else:
                _emit_long_run(out, src, start, lits)
        if is_tail:
            break
        # --- match ---
        # trailing-literal S of THIS match = next gap if 1..3 else 0
        nxt_lits = ops[k + 1][1] if k + 1 < len(ops) else tail
        s = nxt_lits if 1 <= nxt_lits <= 3 else 0
        if dist <= 16384:
            lfield = mlen - 2
            if lfield <= 31:
                out.append(32 | lfield)
            else:
                out.append(32)
                rem = mlen - 33
                zeros, last = divmod(rem - 1, 255)
                out.extend(b"\x00" * zeros)
                out.append(last + 1)
            v = ((dist - 1) << 2) | s
            out.append(v & 0xFF)
            out.append(v >> 8)
        else:  # M4: 16384 < dist <= 49151
            d = dist - 16384
            h = (d >> 14) & 1
            lfield = mlen - 2
            if lfield <= 7:
                out.append(16 | (h << 3) | lfield)
            else:
                out.append(16 | (h << 3))
                rem = mlen - 9
                zeros, last = divmod(rem - 1, 255)
                out.extend(b"\x00" * zeros)
                out.append(last + 1)
            v = ((d & 0x3FFF) << 2) | s
            out.append(v & 0xFF)
            out.append(v >> 8)
        if s:
            nstart = ops[k + 1][0] if k + 1 < len(ops) else lit_start
            out.extend(src[nstart : nstart + s])
            # consume those literals so the next iteration sees lits=0
            if k + 1 < len(ops):
                st, ln, dd, ml = ops[k + 1]
                ops[k + 1] = (st + s, ln - s, dd, ml)
            else:
                lit_start += s
                tail -= s
        first = False
        k += 1

    out.extend(b"\x11\x00\x00")
    return bytes(out)
