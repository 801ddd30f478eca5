"""E5/E6/D11/D12 — string codecs.

Representation convention: a string column is (blob: bytes, lengths:
int64[n]) — the concatenation of all (non-null) values plus per-value
byte lengths (offsets = prefix sums), mirroring ORC's DATA + LENGTH
stream pair (verified on the corpus, SURVEY.md §1.4/§2.3 D11).

- Dictionary encoding uses a **sorted** symbol table (ORC DICTIONARY_V2
  semantics, §2.3 D12): ``np.unique`` returns exactly (sorted uniques,
  inverse indexes).
- FSST (Boncz/Neumann/Leis, "FSST: Fast Random Access String
  Compression", VLDB 2020) is implemented as a vectorized variant with
  symbols of length 1 and 2 trained per stripe: code 255 escapes raw
  bytes; single-byte symbols avoid escape blowup; digram matches are
  chosen greedily left-to-right (computed vectorized via the
  run-parity trick — within a maximal run of matchable positions,
  greedy selects every other one). No per-byte Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ESCAPE = 255
_MAX_SYMBOLS = 255  # codes 0..254; 255 reserved for escape


def column_as_arrow(blob: bytes, lengths: np.ndarray) -> pa.Array:
    """(blob, lengths) -> zero-copy large_binary Arrow array."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(lengths), [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)]
    )


def dict_encode(blob: bytes, lengths: np.ndarray) -> tuple[bytes, np.ndarray, np.ndarray]:
    """-> (sorted dictionary blob, dict entry lengths, indexes per value).

    Hash-based distinct via Arrow's C++ kernel (no per-row Python over
    values); only the k distinct entries are touched in Python when
    building the sorted symbol table.
    """
    arr = column_as_arrow(blob, lengths)
    denc = arr.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = np.array(denc.dictionary.to_pylist(), dtype=object)
    perm = np.argsort(uniques)  # sorted symbol table (ORC DICTIONARY_V2)
    rank = np.empty(len(perm), dtype=np.int64)
    rank[perm] = np.arange(len(perm))
    sorted_uniques = uniques[perm].tolist()
    dict_blob = b"".join(sorted_uniques)
    dict_lengths = np.array([len(u) for u in sorted_uniques], dtype=np.int64)
    return dict_blob, dict_lengths, rank[idx]


def dict_decode(dict_blob: bytes, dict_lengths: np.ndarray, indexes: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Inverse of :func:`dict_encode` -> (blob, lengths)."""
    d_off = np.zeros(len(dict_lengths) + 1, dtype=np.int64)
    np.cumsum(dict_lengths, out=d_off[1:])
    db = np.frombuffer(dict_blob, dtype=np.uint8)
    lengths = dict_lengths[indexes]
    starts = d_off[indexes]
    # gather: for each value, copy its dictionary slice (vectorized by
    # building a flat index array)
    out_off = np.zeros(len(indexes) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    total = int(out_off[-1])
    flat_idx = np.repeat(starts - out_off[:-1], lengths) + np.arange(total)
    return db[flat_idx].tobytes(), lengths


# ---------------------------------------------------------------- FSST-lite

class FsstTable:
    """Symbol table: up to 255 symbols of length 1 or 2.

    Serialized layout: u8 n_symbols, then per symbol: u8 length +
    symbol bytes.
    """

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= _MAX_SYMBOLS
        self.symbols = symbols
        # decode tables
        self.out_len = np.zeros(256, dtype=np.int64)
        self.out_bytes = np.zeros((256, 2), dtype=np.uint8)
        for code, s in enumerate(symbols):
            self.out_len[code] = len(s)
            self.out_bytes[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        # encode tables
        self.digram_code = np.full(65536, ESCAPE, dtype=np.uint8)
        self.single_code = np.full(256, ESCAPE, dtype=np.uint8)
        for code, s in enumerate(symbols):
            if len(s) == 2:
                self.digram_code[s[0] * 256 + s[1]] = code
            else:
                self.single_code[s[0]] = code

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out.extend(s)
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "FsstTable":
        n = buf[0]
        pos = 1
        symbols = []
        for _ in range(n):
            ln = buf[pos]
            pos += 1
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols)


def fsst_train(blob: bytes, sample_limit: int = 1 << 16) -> FsstTable:
    """Pick the most profitable <=255 symbols from a bounded sample.

    Digrams save 1 byte/use; single-byte symbols save 1 byte/use vs the
    escape pair they would otherwise need. Ranked jointly by savings.
    """
    b = np.frombuffer(blob[:sample_limit], dtype=np.uint8)
    if len(b) == 0:
        return FsstTable([])
    single_counts = np.bincount(b, minlength=256).astype(np.int64)
    if len(b) >= 2:
        digrams = b[:-1].astype(np.int32) * 256 + b[1:]
        digram_counts = np.bincount(digrams, minlength=65536).astype(np.int64)
    else:
        digram_counts = np.zeros(65536, dtype=np.int64)
    # candidates: all bytes that appear (gain = count, else escape costs 2x),
    # all digrams with count >= 4 (gain ~= count)
    cands: list[tuple[int, bytes]] = []
    for v in np.flatnonzero(single_counts).tolist():
        cands.append((int(single_counts[v]), bytes([v])))
    top_digrams = np.argsort(digram_counts)[::-1][:512]
    for d in top_digrams.tolist():
        c = int(digram_counts[d])
        if c >= 4:
            cands.append((c, bytes([d >> 8, d & 0xFF])))
    cands.sort(key=lambda t: (-t[0], t[1]))
    return FsstTable([s for _, s in cands[:_MAX_SYMBOLS]])


def fsst_encode(blob: bytes, table: FsstTable, boundaries: np.ndarray | None = None) -> bytes:
    """Compress a blob with the trained table, vectorized.

    ``boundaries``: optional sorted positions (prefix-sum offsets) that
    digram matches must not span (string boundaries), so a later
    whole-blob decode + original-lengths split reconstructs every value.
    """
    b = np.frombuffer(blob, dtype=np.uint8)
    n = len(b)
    if n == 0:
        return b""
    if n >= 2:
        digrams = b[:-1].astype(np.int32) * 256 + b[1:]
        dcode = table.digram_code[digrams]
        matchable = np.empty(n, dtype=bool)
        matchable[:-1] = dcode != ESCAPE
        matchable[-1] = False
    else:
        dcode = np.empty(0, dtype=np.uint8)
        matchable = np.zeros(n, dtype=bool)
    if boundaries is not None and len(boundaries) and n >= 2:
        # a digram starting at boundary-1 spans two strings -> forbid
        spans = boundaries[(boundaries >= 1) & (boundaries <= n - 1)] - 1
        matchable[spans] = False
    # greedy left-to-right selection of non-overlapping digram matches:
    # within each maximal run of matchable positions, take every other one
    starts_mask = matchable & ~np.concatenate(([False], matchable[:-1]))
    run_id = np.cumsum(starts_mask)
    pos_in_run = np.arange(n) - np.maximum.accumulate(np.where(starts_mask, np.arange(n), -1))
    chosen = matchable & (pos_in_run % 2 == 0)
    # positions consumed as the 2nd byte of a chosen digram
    consumed = np.zeros(n, dtype=bool)
    consumed[1:] = chosen[:-1]
    literal = ~chosen & ~consumed
    # output sizes: chosen -> 1 byte; literal with single code -> 1; else 2
    scode = table.single_code[b]
    lit_single = literal & (scode != ESCAPE)
    lit_escape = literal & (scode == ESCAPE)
    out_size = int(chosen.sum()) + int(lit_single.sum()) + 2 * int(lit_escape.sum())
    out = np.empty(out_size, dtype=np.uint8)
    # per-input-position output width (0 for consumed)
    width = np.zeros(n, dtype=np.int64)
    width[chosen] = 1
    width[lit_single] = 1
    width[lit_escape] = 2
    opos = np.zeros(n, dtype=np.int64)
    np.cumsum(width[:-1], out=opos[1:])
    out[opos[chosen]] = dcode[np.flatnonzero(chosen)]
    out[opos[lit_single]] = scode[lit_single]
    e = np.flatnonzero(lit_escape)
    out[opos[e]] = ESCAPE
    out[opos[e] + 1] = b[e]
    return out.tobytes()


def fsst_decode(data: bytes, table: FsstTable) -> bytes:
    """Vectorized decode: classify each byte as code vs escape-payload via
    the run-parity trick over runs of ESCAPE bytes, then expand."""
    c = np.frombuffer(data, dtype=np.uint8)
    n = len(c)
    if n == 0:
        return b""
    is_esc_byte = c == ESCAPE
    # Determine real escape markers: scanning left to right, an ESCAPE
    # byte is a marker unless it is the payload of the previous marker.
    # Within each maximal run of bytes "still in escape context", markers
    # sit at even offsets. Escape context = runs formed by: ESCAPE bytes
    # plus the single byte following each marker. Equivalent simple rule:
    # within each maximal run of consecutive ESCAPE bytes, even offsets
    # are markers; a marker's payload is the next byte (ESCAPE or not).
    run_start = is_esc_byte & ~np.concatenate(([False], is_esc_byte[:-1]))
    pos_in_run = np.arange(n) - np.maximum.accumulate(np.where(run_start, np.arange(n), -1))
    marker = is_esc_byte & (pos_in_run % 2 == 0)
    payload = np.zeros(n, dtype=bool)
    payload[1:] = marker[:-1]
    code_pos = ~marker & ~payload  # plain symbol codes
    out_w = np.zeros(n, dtype=np.int64)
    out_w[code_pos] = table.out_len[c[code_pos]]
    out_w[payload] = 1
    total = int(out_w.sum())
    opos = np.zeros(n, dtype=np.int64)
    np.cumsum(out_w[:-1], out=opos[1:])
    out = np.empty(total, dtype=np.uint8)
    cp = np.flatnonzero(code_pos)
    w1 = cp[out_w[cp] == 1]
    w2 = cp[out_w[cp] == 2]
    out[opos[w1]] = table.out_bytes[c[w1], 0]
    out[opos[w2]] = table.out_bytes[c[w2], 0]
    out[opos[w2] + 1] = table.out_bytes[c[w2], 1]
    pp = np.flatnonzero(payload)
    out[opos[pp]] = c[pp]
    return out.tobytes()


def fsst_compress_column(blob: bytes, lengths: np.ndarray) -> tuple[bytes, bytes] | None:
    """Train + compress a string column. Returns (table_bytes, data) or
    None when unprofitable (<5% savings), mirroring E6's fallback."""
    table = fsst_train(blob)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = fsst_encode(blob, table, boundaries=offsets[1:-1])
    tbl = table.serialize()
    if len(data) + len(tbl) > 0.95 * max(1, len(blob)):
        return None
    return tbl, data


def fsst_decompress_column(table_bytes: bytes, data: bytes, lengths: np.ndarray) -> tuple[bytes, np.ndarray]:
    table = FsstTable.deserialize(table_bytes)
    return fsst_decode(data, table), lengths
