"""Property fuzz for the round-3 seek kernels: ranged runfor decode and
the byte-RLE control map must agree with their full-decode references on
arbitrary shapes."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_orc_spark.codecs.byterle import byte_rle_decode, byte_rle_encode
from datafusion_orc_spark.codecs.runfor import (
    runfor_decode,
    runfor_decode_range,
    runfor_encode,
)


@st.composite
def runny_arrays(draw):
    segs = []
    for _ in range(draw(st.integers(1, 8))):
        kind = draw(st.integers(0, 2))
        if kind == 0:  # long run
            segs.append(
                np.full(draw(st.integers(32, 200)), draw(st.integers(-(2**40), 2**40)))
            )
        elif kind == 1:  # literals
            n = draw(st.integers(1, 120))
            lo = draw(st.integers(-(2**20), 2**20))
            segs.append(np.arange(lo, lo + n) * draw(st.integers(1, 9)))
        else:  # outliers
            segs.append(np.array([draw(st.integers(-(2**50), 2**50))]))
    return np.concatenate(segs).astype(np.int64)


@settings(max_examples=60, deadline=None)
@given(runny_arrays(), st.data())
def test_runfor_range_equals_full_slice(v, data):
    n = len(v)
    streams = runfor_encode(v)
    full = runfor_decode(streams, n)
    assert np.array_equal(full, v)
    s = data.draw(st.integers(0, n - 1))
    e = data.draw(st.integers(s + 1, n))
    assert np.array_equal(runfor_decode_range(streams, n, s, e), v[s:e])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(1, 300)), min_size=1, max_size=20),
    st.data(),
)
def test_byte_rle_controls_locate_every_byte(runs, data):
    b = np.concatenate([np.full(ln, val, dtype=np.uint8) for val, ln in runs])
    enc, c_out, c_in = byte_rle_encode(b, return_controls=True)
    assert np.array_equal(byte_rle_decode(np.frombuffer(enc, dtype=np.uint8)), b)
    assert c_in[0] == 0 and np.all(np.diff(c_in) > 0) and np.all(np.diff(c_out) > 0)
    # decoding the stream FROM any control's output offset reproduces the
    # suffix starting at that control's input index — the seek contract
    k = data.draw(st.integers(0, len(c_out) - 1))
    suffix = byte_rle_decode(np.frombuffer(enc[int(c_out[k]) :], dtype=np.uint8))
    assert np.array_equal(suffix, b[int(c_in[k]) :])
