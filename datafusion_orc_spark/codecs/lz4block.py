"""Pure-python LZ4 *block* decoder (the format ORC frames per chunk).

Why this exists: pyarrow's ``Codec("lz4_raw").decompress(buf, n)``
requires the exact decompressed size and silently zero-pads when the
guess is too large, but an ORC compressed chunk only bounds its
decompressed size by compressionBlockSize — the real size is returned
by LZ4_decompress_safe in C, which pyarrow does not expose. This
decoder returns the exact bytes. Sequential by nature; used only on
the LZ4-ORC read path (chunks <= 256 KiB), not in any hot loop.

Format (public LZ4 block spec): sequences of
  token(1B: hi=literal len, lo=match len-4) [lit-len ext] literals
  [2B LE match offset] [match-len ext]; last sequence is literals-only.
"""

from __future__ import annotations


def lz4_block_decompress(src: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError(
                f"lz4: truncated literal run (need {lit} bytes at {i}, have {n - i})"
            )
        out += src[i : i + lit]
        i += lit
        if i >= n:  # last sequence: literals only
            break
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: match offset before output start")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:  # overlapping match: byte-wise copy semantics
            for k in range(mlen):
                out.append(out[start + k])
    return bytes(out)
