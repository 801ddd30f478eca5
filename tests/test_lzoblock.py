"""LZO1X block codec (ORC compression kind 3) — r5 verdict task #5.

Three evidence layers:
  1. hand-crafted instruction vectors pin every decoder opcode class,
     including the state-dependent 0..15 forms and the M2 64..255 forms
     our own compressor never emits;
  2. compress->decompress round-trip fuzz across entropy shapes;
  3. foreign conformance both directions: ORC C++ (pyarrow.orc, which
     carries its own native LZO decoder) reads files our writer
     compresses with kind 3, and ORC-Java (Spark, aircompressor LZO)
     writes files our pure-python decoder must match bit-identically.
"""

import glob
import random

import numpy as np
import pyarrow as pa
import pyarrow.orc
import pytest

from datafusion_orc_spark.codecs.lzoblock import lzo1x_compress, lzo1x_decompress
from datafusion_orc_spark.format.orc_reader import OrcReader, read_orc
from datafusion_orc_spark.format.orc_writer import write_orc

EOS = b"\x11\x00\x00"


# ------------------------------------------------------- decoder vectors

def test_empty_stream_is_just_eos():
    assert lzo1x_decompress(EOS) == b""
    assert lzo1x_compress(b"") == EOS


def test_initial_literal_run_short_and_long():
    # first byte 18..20: 1..3 literals, state = count
    assert lzo1x_decompress(bytes([18]) + b"x" + EOS) == b"x"
    # first byte 21..255: byte-17 literals
    assert lzo1x_decompress(bytes([21]) + b"abcd" + EOS) == b"abcd"
    assert lzo1x_decompress(bytes([17 + 238]) + b"z" * 238 + EOS) == b"z" * 238


def test_long_literal_run_with_zero_extension():
    # at state 0, opcode 0 extends: length = 3 + 15 + 255*zeros + last
    n = 3 + 15 + 255 + 42
    data = bytes(range(256)) * 2
    src = bytes([0, 0, 42]) + data[:n] + EOS
    assert lzo1x_decompress(src) == data[:n]


def test_m1_two_byte_match_after_short_literals():
    # initial run of 2 ("ab", state=2) then opcode t<16 = 2-byte match:
    # dist = (H << 2) + (t >> 2) + 1 -> t=4 (D=1), H=0 -> dist 2
    src = bytes([19]) + b"ab" + bytes([4, 0]) + EOS
    assert lzo1x_decompress(src) == b"abab"


def test_m1_three_byte_match_at_state4():
    # long literal run of 2100 (state=4), then t<16 = 3-byte match at
    # dist = (H << 2) + (t >> 2) + 2049 -> t=4, H=0 -> dist 2050
    lit_len = 2100
    rem = lit_len - 18  # opcode-0 extension: 3 + 15 + 255*z + last
    zeros, last = divmod(rem - 1, 255)
    data = bytes((i * 7) & 0xFF for i in range(lit_len))
    src = bytes([0]) + b"\x00" * zeros + bytes([last + 1]) + data
    src += bytes([4, 0]) + EOS
    expect = data + data[lit_len - 2050 : lit_len - 2050 + 3]
    assert lzo1x_decompress(src) == expect


def test_m2_short_matches():
    # 64..127: len = 3 + ((t>>5)&1), dist = (H<<3) + ((t>>2)&7) + 1
    # t = 64 | 32 | (3 << 2) = 108 -> len 4, D=3, H=0 -> dist 4
    src = bytes([21]) + b"abcd" + bytes([108, 0]) + EOS
    assert lzo1x_decompress(src) == b"abcdabcd"
    # 128..255: len = 5 + ((t>>5)&3); t = 128 | (1<<5) | (3<<2) = 172 -> len 6
    src = bytes([21]) + b"abcd" + bytes([172, 0]) + EOS
    assert lzo1x_decompress(src) == b"abcd" + b"abcdab"


def test_trailing_literals_ride_s_bits():
    # match with S=2: two literals follow the LE16 inline
    # M3 t=33 (len 3), v = ((dist-1)<<2)|S with dist 4, S=2
    v = (3 << 2) | 2
    src = bytes([21]) + b"abcd" + bytes([33, v & 0xFF, v >> 8]) + b"XY" + EOS
    assert lzo1x_decompress(src) == b"abcdabcXY"


def test_overlapping_match_is_bytewise():
    # dist 1, len 5 at state 4: replicates last byte (RLE-style)
    v = (0 << 2) | 0
    src = bytes([21]) + b"abcd" + bytes([32 | 3, v & 0xFF, v >> 8]) + EOS
    assert lzo1x_decompress(src) == b"abcd" + b"ddddd"


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        lzo1x_decompress(bytes([21]) + b"abcd")  # no EOS
    with pytest.raises(ValueError):
        lzo1x_decompress(bytes([255]) + b"xy")  # truncated literal run


# ------------------------------------------------------- round-trip fuzz

def test_roundtrip_fuzz():
    random.seed(1)
    rng = np.random.default_rng(1)
    cases = [
        b"", b"a", b"abc", b"abcd", b"hello world " * 100, bytes(range(256)),
        b"\x00" * 10000, b"ab" * 5,
        rng.integers(0, 256, 100000).astype(np.uint8).tobytes(),
        (b"token-sequence-" * 4000)[:50000],
    ]
    # long-distance repeats exercise the M4 (16..48 kB) opcode class
    big = bytearray()
    block = bytes(rng.integers(0, 256, 2000).astype(np.uint8))
    for _ in range(30):
        big += block + bytes(rng.integers(0, 256, rng.integers(1, 20000)).astype(np.uint8))
    cases.append(bytes(big))
    for t in range(60):
        n = random.randint(0, 30000)
        if t % 3 == 0:
            data = bytes(rng.integers(0, 5, n).astype(np.uint8))
        elif t % 3 == 1:
            words = [
                bytes(rng.integers(97, 123, random.randint(2, 12)).astype(np.uint8))
                for _ in range(20)
            ]
            data = b"".join(random.choice(words) for _ in range(n // 6))
        else:
            data = bytes(rng.integers(0, 256, n).astype(np.uint8))
        cases.append(data)
    for c in cases:
        assert lzo1x_decompress(lzo1x_compress(c)) == c


# ------------------------------------------------------- ORC integration

def _table(n=3000):
    rng = np.random.default_rng(0)
    return pa.table({
        "doc_id": pa.array([f"doc-{i:08d}" for i in range(n)]),
        "source": pa.array([f"src{i % 8}" for i in range(n)]),
        "n": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        "toks": pa.array(
            [rng.integers(0, 50000, rng.integers(1, 30)).tolist() for _ in range(n)],
            type=pa.list_(pa.int32()),
        ),
    })


def test_lzo_orc_file_read_by_orc_cxx_and_ourselves(tmp_path):
    """ORC C++ ships its own native LZO decoder, so pyarrow.orc reading
    our kind-3 file is a real foreign conformance check of the
    compressor (not a self-round-trip)."""
    tbl = _table()
    p = str(tmp_path / "ours_lzo.orc")
    write_orc(tbl, p, stripe_rows=1000, compression="lzo")
    assert OrcReader(p).postscript.compression == 3
    assert pyarrow.orc.ORCFile(p).read().equals(tbl)
    assert read_orc(p).equals(tbl)


def test_orc_java_lzo_file_decodes_bit_identical(spark, tmp_path):
    """Foreign encoder direction: ORC-Java (aircompressor LZO1X) writes;
    our pure-python decoder must match the ORC C++ read bit-identically."""
    d = str(tmp_path / "java_lzo")
    df = spark.range(0, 50000).selectExpr(
        "id", "concat('doc-', lpad(id, 10, '0')) AS doc_id",
        "cast(id % 7 as string) AS src")
    df.write.mode("overwrite").option("compression", "lzo").orc(d)
    for f in glob.glob(d + "/*.orc"):
        assert OrcReader(f).postscript.compression == 3
        ours = read_orc(f)
        ref = pyarrow.orc.ORCFile(f).read()
        assert ours.num_rows == ref.num_rows
        for i in range(ours.num_columns):
            assert ours.column(i).combine_chunks().equals(
                ref.column(i).combine_chunks())
