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


def byte_rle_encode(data: bytes | np.ndarray, return_controls: bool = False):
    """Encode bytes with ORC byte-RLE. Vectorized run detection.

    ``return_controls=True`` additionally returns two int64 arrays
    (out_pos, in_pos): for every emitted control byte, its byte offset
    in the output and the input byte index its run/literal starts at —
    the seek table ROW_INDEX positions are computed from (a control
    covers input bytes [in_pos, in_pos + run_len), so the position of
    input byte b is (out_pos, b - in_pos) for the last control with
    in_pos <= b).
    """
    b = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data.astype(np.uint8, copy=False)
    n = len(b)
    ctrl_out: list[int] = []
    ctrl_in: list[int] = []
    if n == 0:
        if return_controls:
            return b"", np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return b""
    # run starts: positions where value changes
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(b[1:], b[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n))
    out = bytearray()
    lit_buf = bytearray()
    lit_start = 0  # input index of lit_buf[0] while lit_buf is non-empty

    def flush_literals() -> None:
        i = 0
        while i < len(lit_buf):
            chunk = lit_buf[i : i + _MAX_LITERAL]
            ctrl_out.append(len(out))
            ctrl_in.append(lit_start + i)
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
                ctrl_out.append(len(out))
                ctrl_in.append(s + ln - rem)
                out.append(take - 3)
                out.append(val)
                rem -= take
            if rem:
                lit_start = s + ln - rem
                lit_buf.extend(bytes([val]) * rem)
        else:
            if not lit_buf:
                lit_start = s
            lit_buf.extend(b[s : s + ln].tobytes())
    flush_literals()
    if return_controls:
        return bytes(out), np.array(ctrl_out, dtype=np.int64), np.array(ctrl_in, dtype=np.int64)
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


def bool_rle_encode(flags: np.ndarray, return_controls: bool = False):
    """Booleans -> MSB-first bit-packed bytes -> byte RLE (ORC boolean RLE).

    With ``return_controls`` the control map is over PACKED byte indexes
    (bit i lives in packed byte i//8 at bit offset i%8)."""
    bits = np.asarray(flags, dtype=bool)
    packed = np.packbits(bits)  # pads trailing bits with 0, matching ORC
    return byte_rle_encode(packed, return_controls)


def bool_rle_decode(data: bytes | np.ndarray, n: int) -> np.ndarray:
    """Decode ORC boolean RLE to a bool array of length n."""
    nbytes = (n + 7) // 8
    packed = byte_rle_decode(data, nbytes)
    return np.unpackbits(packed, count=n).astype(bool)
