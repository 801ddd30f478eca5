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
