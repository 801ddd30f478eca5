"""ORC writer conformance: files produced by OUR codec kernels must be
read bit-identically by the Apache ORC C++ reader (pyarrow.orc) — the
same implementation family the reference delegates decoding to."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.orc

from datafusion_orc_spark.format.orc_reader import read_orc
from datafusion_orc_spark.format.orc_writer import write_orc


def _f1_table(n=5000, seed=42):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array([f"doc-{i:012d}" for i in range(n)]),
        "tokens": pa.array(
            [rng.integers(0, 50257, int(l)).tolist() for l in rng.integers(1, 50, n)],
            type=pa.list_(pa.int32()),
        ),
        "n_tok": pa.array(rng.integers(0, 2048, n).astype(np.int32)),
        "source": pa.array([f"src_{i % 8}" for i in range(n)]),
        "flag": pa.array((np.arange(n) // 100) % 2 == 0),
        "val": pa.array(rng.random(n)),
        "nullable": pa.array([None if i % 7 == 0 else int(i) for i in range(n)], type=pa.int64()),
        "tiny": pa.array((rng.integers(-128, 128, n)).astype(np.int8)),
        "blob": pa.array([bytes([i % 256]) * (i % 5) for i in range(n)], type=pa.binary()),
    })


def test_orc_cxx_reads_our_files(tmp_path):
    tbl = _f1_table()
    path = str(tmp_path / "ours.orc")
    write_orc(tbl, path, stripe_rows=1500)  # multiple stripes
    back = pyarrow.orc.ORCFile(path).read()
    assert back.num_rows == tbl.num_rows
    for name in tbl.schema.names:
        assert back.column(name).combine_chunks().equals(tbl.column(name).combine_chunks()), name


def test_our_reader_reads_our_files(tmp_path):
    tbl = _f1_table(1000)
    path = str(tmp_path / "ours2.orc")
    write_orc(tbl, path, stripe_rows=300)
    ours = read_orc(path)
    for name in tbl.schema.names:
        assert ours.column(name).combine_chunks().equals(tbl.column(name).combine_chunks()), name


def test_size_not_worse_than_orc_cxx(tmp_path):
    """Compressed-size gate vs the reference family, like-for-like
    (both uncompressed containers, pure encoding efficiency)."""
    tbl = _f1_table(20000)
    ours = str(tmp_path / "ours.orc")
    theirs = str(tmp_path / "cxx.orc")
    write_orc(tbl, ours, stripe_rows=65536)
    pyarrow.orc.write_table(tbl, theirs, compression="uncompressed")
    ours_sz, theirs_sz = os.path.getsize(ours), os.path.getsize(theirs)
    assert ours_sz <= theirs_sz * 1.02, (ours_sz, theirs_sz)


def test_empty_and_single_row(tmp_path):
    for i, tbl in enumerate([
        pa.table({"a": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.string())}),
        pa.table({"a": pa.array([7], type=pa.int64()), "s": pa.array(["x"])}),
    ]):
        path = str(tmp_path / f"edge{i}.orc")
        write_orc(tbl, path)
        back = pyarrow.orc.ORCFile(path).read()
        assert back.num_rows == tbl.num_rows
        for name in tbl.schema.names:
            assert back.column(name).to_pylist() == tbl.column(name).to_pylist()


# ---------------------------------------------------------------- compression

def test_compressed_writes_read_back_by_orc_cxx(tmp_path):
    """SNAPPY/ZLIB/ZSTD/LZ4-compressed files (every stream + footers
    chunk-framed) must be read bit-identically by the ORC C++ reader AND
    by our own reader."""
    tbl = _f1_table(3000)
    for comp in ("snappy", "zlib", "zstd", "lz4"):
        path = str(tmp_path / f"ours_{comp}.orc")
        write_orc(tbl, path, stripe_rows=1000, compression=comp)
        got = pyarrow.orc.ORCFile(path).read()
        assert got.equals(tbl), comp
        ours = read_orc(path)
        assert ours.equals(tbl), comp


def test_dictionary_v2_written_for_low_cardinality_strings(tmp_path):
    """source (8 distinct / 3000 rows) must be DICTIONARY_V2 with a sorted
    symbol table; doc_id (all distinct) must stay DIRECT_V2."""
    from datafusion_orc_spark.format import orc_proto as proto
    from datafusion_orc_spark.format.orc_reader import OrcReader, _StripeReader, decompress_stream

    tbl = _f1_table(3000)
    path = str(tmp_path / "dict.orc")
    write_orc(tbl, path, stripe_rows=4096, compression="snappy")
    r = OrcReader(path)
    names = r.footer.types[0].field_names
    sr = _StripeReader(r, r.footer.stripes[0])
    col_source = r.footer.types[0].subtypes[names.index("source")]
    col_docid = r.footer.types[0].subtypes[names.index("doc_id")]
    assert sr.encodings[col_source].kind == proto.E_DICTIONARY_V2
    assert sr.encodings[col_source].dictionary_size == 8
    assert sr.encodings[col_docid].kind == proto.E_DIRECT_V2
    # sorted symbol table: dictionary blob must be lexicographically ordered
    from datafusion_orc_spark.codecs.rlev2 import rle_v2_decode
    lengths = rle_v2_decode(sr.stream(col_source, proto.S_LENGTH), 8, signed=False)
    blob = sr.stream(col_source, proto.S_DICTIONARY_DATA)
    vals, pos = [], 0
    for ln in lengths:
        vals.append(blob[pos : pos + int(ln)])
        pos += int(ln)
    assert vals == sorted(vals)


def test_snappy_size_not_worse_than_orc_cxx(tmp_path):
    """Compressed-size gate at file level: our snappy file <= ORC C++'s
    snappy file on the same data (the corpus configuration)."""
    tbl = _f1_table(20_000)
    ours = str(tmp_path / "ours.orc")
    theirs = str(tmp_path / "cxx.orc")
    write_orc(tbl, ours, stripe_rows=65536, compression="snappy")
    pyarrow.orc.write_table(
        tbl, theirs, compression="snappy", compression_block_size=262144,
        stripe_size=64 * 1024 * 1024,
    )
    assert pyarrow.orc.ORCFile(ours).read().equals(tbl)
    assert os.path.getsize(ours) <= os.path.getsize(theirs) * 1.02, (
        os.path.getsize(ours), os.path.getsize(theirs)
    )
