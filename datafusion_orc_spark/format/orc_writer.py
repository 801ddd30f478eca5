"""ORC v1 file WRITER — produces real ``.orc`` files from Arrow data
using this engine's codec kernels (RLEv2, byte/bool RLE, varints).

The reference crate is read-only (SURVEY.md §2.1: no writer anywhere in
the checkout); this module is the complement that proves format-level
parity in the strongest way available in-sandbox: files written here are
read back bit-identically by the Apache ORC C++ reader (pyarrow.orc) —
i.e. by the same implementation family the reference delegates decoding
to (orc-rust mirrors the same spec).

Scope: NONE/SNAPPY/ZLIB/LZ4/ZSTD compression (every stream, stripe
footer and file footer chunk-framed with the 3-byte (len<<1)|isOriginal
header — the corpus the reference ships is SNAPPY), DICTIONARY_V2 with
SORTED symbol tables for strings (ORC writer heuristic: dictionary when
distinct/total <= 0.8, mirroring orc.dictionary.key.threshold), one type
tree of boolean/int8/16/32/64/float/double/string/binary/list, nullable
via PRESENT streams, multiple stripes, rowIndexStride=0 (no ROW_INDEX
streams). ORC requires a ROW_INDEX per column when rowIndexStride>0;
setting it to 0 keeps readers happy without index streams.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datafusion_orc_spark.codecs.byterle import bool_rle_encode, byte_rle_encode
from datafusion_orc_spark.codecs.rlev2 import rle_v2_encode
from datafusion_orc_spark.format import orc_proto as proto

MAGIC = b"ORC"

# postscript CompressionKind values (ORC v1 spec)
_COMPRESSION_KINDS = {"none": 0, "zlib": 1, "snappy": 2, "lz4": 4, "zstd": 5}

# ORC's default dictionary heuristic (orc.dictionary.key.threshold=0.8):
# dictionary-encode a string column when distinct/total <= this ratio
DICT_KEY_THRESHOLD = 0.8


def _compress_chunk(chunk: bytes, kind: int) -> bytes:
    if kind == 1:  # ZLIB = raw deflate
        co = zlib.compressobj(level=6, wbits=-15)
        return co.compress(chunk) + co.flush()
    if kind == 2:  # SNAPPY
        return pa.Codec("snappy").compress(chunk).to_pybytes()
    if kind == 4:  # LZ4 (block format)
        return pa.Codec("lz4_raw").compress(chunk).to_pybytes()
    if kind == 5:  # ZSTD (framed)
        return pa.Codec("zstd").compress(chunk).to_pybytes()
    raise NotImplementedError(f"compression kind {kind}")


def compress_stream(raw: bytes, kind: int, block: int = 262144) -> bytes:
    """Chunk-frame `raw` for an ORC compressed stream: per <=block chunk,
    3-byte LE header (len << 1) | isOriginal, falling back to the
    original bytes when compression does not shrink the chunk (spec
    behavior; format/orc_reader.py decompress_stream is the inverse)."""
    if kind == 0 or not raw:
        return raw
    out = bytearray()
    for pos in range(0, len(raw), block):
        chunk = raw[pos : pos + block]
        comp = _compress_chunk(chunk, kind)
        if len(comp) >= len(chunk):
            hdr = (len(chunk) << 1) | 1
            body = chunk
        else:
            hdr = len(comp) << 1
            body = comp
        out += bytes((hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF))
        out += body
    return bytes(out)


# ------------------------------------------------------------ protobuf write

def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(tag: int, value: int) -> bytes:
    return _varint((tag << 3) | 0) + _varint(value)


def _field_bytes(tag: int, data: bytes) -> bytes:
    return _varint((tag << 3) | 2) + _varint(len(data)) + data


def _packed_varints(tag: int, values: list[int]) -> bytes:
    payload = b"".join(_varint(v) for v in values)
    return _field_bytes(tag, payload)


# ------------------------------------------------------------ type tree

_PRIM_KINDS = {
    pa.bool_(): proto.BOOLEAN,
    pa.int8(): proto.BYTE,
    pa.int16(): proto.SHORT,
    pa.int32(): proto.INT,
    pa.int64(): proto.LONG,
    pa.float32(): proto.FLOAT,
    pa.float64(): proto.DOUBLE,
    pa.string(): proto.STRING,
    pa.binary(): proto.BINARY,
    pa.date32(): proto.DATE,
}


# ------------------------------------------------------------ column encode

def _dictionary_streams(dense: pa.Array) -> tuple[list[tuple[int, bytes]], int] | None:
    """DICTIONARY_V2 streams with a SORTED symbol table, or None when the
    column does not pass the dictionary heuristic (distinct/total > 0.8)."""
    n_vals = len(dense)
    if n_vals == 0:
        return None
    d = dense.combine_chunks().dictionary_encode() if isinstance(dense, pa.ChunkedArray) else dense.dictionary_encode()
    vals = d.dictionary.cast(pa.large_binary()).to_pylist()
    if len(vals) > DICT_KEY_THRESHOLD * n_vals:
        return None
    order = np.argsort(np.array(vals, dtype=object), kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sorted_vals = [vals[i] for i in order]
    streams = [
        (proto.S_DATA, rle_v2_encode(rank[idx], signed=False)),
        (proto.S_DICTIONARY_DATA, b"".join(sorted_vals)),
        (proto.S_LENGTH, rle_v2_encode(np.array([len(v) for v in sorted_vals], dtype=np.int64), signed=False)),
    ]
    return streams, len(sorted_vals)


def _encode_orc_column(arr: pa.Array, typ: pa.DataType) -> tuple[list[tuple[int, bytes]], int, int, list]:
    """-> (streams [(kind, bytes)...] for this column, encoding kind,
    dictionary size, child (arr, typ) pairs to encode next)."""
    n = len(arr)
    streams: list[tuple[int, bytes]] = []
    if arr.null_count:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        streams.append((proto.S_PRESENT, bool_rle_encode(valid)))
        dense = arr.drop_null()
    else:
        dense = arr
    children: list = []
    enc = proto.E_DIRECT_V2
    dict_size = 0

    if typ == pa.bool_():
        flags = dense.to_numpy(zero_copy_only=False).astype(bool)
        streams.append((proto.S_DATA, bool_rle_encode(flags)))
        enc = proto.E_DIRECT
    elif typ == pa.int8():
        streams.append((proto.S_DATA, byte_rle_encode(dense.to_numpy(zero_copy_only=False).view(np.uint8))))
        enc = proto.E_DIRECT
    elif typ in (pa.int16(), pa.int32(), pa.int64()) or pa.types.is_date32(typ):
        base = dense.cast(pa.int64()).to_numpy(zero_copy_only=False)
        streams.append((proto.S_DATA, rle_v2_encode(base, signed=True)))
    elif typ in (pa.float32(), pa.float64()):
        streams.append((proto.S_DATA, dense.to_numpy(zero_copy_only=False).tobytes()))
        enc = proto.E_DIRECT
    elif typ in (pa.string(), pa.binary()):
        dict_streams = _dictionary_streams(dense) if typ == pa.string() else None
        if dict_streams is not None:
            ds, dict_size = dict_streams
            streams.extend(ds)
            enc = proto.E_DICTIONARY_V2
        else:
            lb = dense.cast(pa.large_binary())
            bufs = lb.buffers()
            off = np.frombuffer(bufs[1], dtype=np.int64, count=len(lb) + 1, offset=lb.offset * 8)
            blob = bufs[2].to_pybytes()[off[0] : off[-1]] if len(lb) else b""
            lengths = np.diff(off)
            streams.append((proto.S_DATA, blob))
            streams.append((proto.S_LENGTH, rle_v2_encode(lengths.astype(np.int64), signed=False)))
    elif pa.types.is_list(typ):
        lengths = pc.list_value_length(dense).to_numpy(zero_copy_only=False).astype(np.int64)
        streams.append((proto.S_LENGTH, rle_v2_encode(lengths, signed=False)))
        children.append((pc.list_flatten(dense), typ.value_type))
    else:
        raise NotImplementedError(f"orc_writer: type {typ}")
    return streams, enc, dict_size, children


def write_orc(
    table: pa.Table,
    path: str,
    stripe_rows: int = 65536,
    compression: str = "none",
    block_size: int = 262144,
) -> None:
    """Write an Arrow table as an ORC v1 file.

    ``compression``: none|snappy|zlib|lz4|zstd — applied per-stream (and
    to stripe/file footers) in <=block_size chunks, matching the corpus
    the reference ships (SNAPPY, block 262144).
    """
    comp = _COMPRESSION_KINDS[compression.lower()]
    table = table.combine_chunks()
    # pre-order ORC type ids, root struct = 0
    types, _arrow_types = _reorder_root_first(table.schema)

    out = bytearray(MAGIC)
    stripe_infos: list[bytes] = []
    total_rows = table.num_rows

    for start in range(0, max(total_rows, 1), stripe_rows):
        batch_tbl = table.slice(start, stripe_rows)
        if batch_tbl.num_rows == 0 and total_rows > 0:
            break
        stripe_offset = len(out)
        # encode columns in ORC id order (root has no streams)
        col_arrays: dict[int, tuple[pa.Array, pa.DataType]] = {}
        # map ORC ids -> arrays via recursive walk identical to the tree build
        _assign_arrays(table.schema, batch_tbl, col_arrays)
        stream_bytes: list[bytes] = []
        stream_meta: list[tuple[int, int, int]] = []  # (column, kind, length)
        encodings: list[tuple[int, int]] = [(proto.E_DIRECT, 0)]  # root struct
        for col_id in sorted(col_arrays):
            arr, typ = col_arrays[col_id]
            streams, enc, dict_size, _children = _encode_orc_column(arr, typ)
            encodings.append((enc, dict_size))
            for kind, data in streams:
                framed = compress_stream(data, comp, block_size)
                stream_meta.append((col_id, kind, len(framed)))
                stream_bytes.append(framed)
        data_len = sum(len(b) for b in stream_bytes)
        for b in stream_bytes:
            out += b
        # stripe footer
        sf = b""
        for col, kind, length in stream_meta:
            sf += _field_bytes(1, _field_varint(1, kind) + _field_varint(2, col) + _field_varint(3, length))
        for enc, dict_size in encodings:
            body = _field_varint(1, enc)
            if dict_size:
                body += _field_varint(2, dict_size)
            sf += _field_bytes(2, body)
        sf = compress_stream(sf, comp, block_size)
        out += sf
        si = (
            _field_varint(1, stripe_offset)
            + _field_varint(2, 0)  # indexLength
            + _field_varint(3, data_len)
            + _field_varint(4, len(sf))
            + _field_varint(5, batch_tbl.num_rows)
        )
        stripe_infos.append(si)
        if total_rows == 0:
            break

    content_length = len(out)
    footer = _field_varint(1, 3) + _field_varint(2, content_length)
    for si in stripe_infos:
        footer += _field_bytes(3, si)
    for tb in types:
        footer += _field_bytes(4, tb)
    footer += _field_varint(6, total_rows)
    footer += _field_varint(8, 0)  # rowIndexStride=0: no ROW_INDEX streams
    footer = compress_stream(footer, comp, block_size)
    out += footer
    ps = (
        _field_varint(1, len(footer))
        + _field_varint(2, comp)
        + _field_varint(3, block_size)
        + _packed_varints(4, [0, 12])
        + _field_varint(5, 0)  # metadata length
        + _field_bytes(8000, MAGIC)
    )
    out += ps
    out.append(len(ps))
    with open(path, "wb") as f:
        f.write(bytes(out))


def _reorder_root_first(schema: pa.Schema) -> tuple[list[bytes], list]:
    """Serialize the type tree with proper pre-order ORC ids (root=0)."""
    entries: list[bytes] = []
    arrow_types: list = []

    def count(typ: pa.DataType) -> int:
        if pa.types.is_list(typ):
            return 1 + count(typ.value_type)
        return 1

    def add(typ: pa.DataType, my_id: int) -> None:
        if typ in _PRIM_KINDS:
            entries.append(_field_varint(1, _PRIM_KINDS[typ]))
            arrow_types.append(typ)
        elif pa.types.is_list(typ):
            entries.append(_field_varint(1, proto.LIST) + _packed_varints(2, [my_id + 1]))
            arrow_types.append(typ)
            add(typ.value_type, my_id + 1)
        else:
            raise NotImplementedError(str(typ))

    sub_ids = []
    next_id = 1
    for f in schema:
        sub_ids.append(next_id)
        next_id += count(f.type)
    root = _field_varint(1, proto.STRUCT) + _packed_varints(2, sub_ids)
    for f in schema:
        root += _field_bytes(3, f.name.encode())
    entries.append(root)
    arrow_types.append(None)
    # entries currently [root] at END via recursion order; rebuild properly:
    ordered: list[bytes] = [root]
    arrow_ordered: list = [None]

    def add2(typ: pa.DataType, my_id: int) -> None:
        if typ in _PRIM_KINDS:
            ordered.append(_field_varint(1, _PRIM_KINDS[typ]))
            arrow_ordered.append(typ)
        elif pa.types.is_list(typ):
            ordered.append(_field_varint(1, proto.LIST) + _packed_varints(2, [my_id + 1]))
            arrow_ordered.append(typ)
            add2(typ.value_type, my_id + 1)

    for f, sid in zip(schema, sub_ids):
        add2(f.type, sid)
    return ordered, arrow_ordered


def _assign_arrays(schema: pa.Schema, tbl: pa.Table, out: dict) -> None:
    """Map ORC column ids (pre-order, root=0) -> (array, type)."""
    next_id = 1

    def walk(arr: pa.Array, typ: pa.DataType) -> None:
        nonlocal next_id
        my_id = next_id
        next_id += 1
        out[my_id] = (arr, typ)
        if pa.types.is_list(typ):
            walk(pc.list_flatten(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr), typ.value_type)

    for i, f in enumerate(schema):
        col = tbl.column(i)
        walk(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, f.type)
