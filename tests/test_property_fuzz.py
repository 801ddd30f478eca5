"""Property-based fuzzing of the codec kernels (hypothesis).

Kept to a bounded number of examples so `python -m pytest -x -q` stays
fast; run with HYPOTHESIS_PROFILE=long for a deeper sweep.
"""

import os

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_orc_spark.codecs.byterle import bool_rle_decode, bool_rle_encode
from datafusion_orc_spark.codecs.rlev2 import rle_v2_decode, rle_v2_encode
from datafusion_orc_spark.codecs.strings import fsst_decode, fsst_encode, fsst_train
from datafusion_orc_spark.format.stripe import decode_column, encode_column

settings.register_profile("default", max_examples=40, suppress_health_check=[HealthCheck.too_slow], deadline=None)
settings.register_profile("long", max_examples=500, suppress_health_check=[HealthCheck.too_slow], deadline=None)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@given(st.lists(i64, min_size=1, max_size=1500))
def test_rlev2_i64_any(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(rle_v2_decode(rle_v2_encode(v), len(v)), v)


@given(st.lists(i32, min_size=1, max_size=1500))
def test_rlev2_i32_any(vals):
    v = np.array(vals, dtype=np.int32)
    assert np.array_equal(rle_v2_decode(rle_v2_encode(v), len(v)), v)


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=1500))
def test_rlev2_unsigned(vals):
    v = np.array(vals, dtype=np.int64)
    enc = rle_v2_encode(v, signed=False)
    assert np.array_equal(rle_v2_decode(enc, len(v), signed=False), v)


@given(st.lists(st.sampled_from([0, 1, 2, 5, -3, 2**40]), min_size=1, max_size=3000))
def test_rlev2_runny(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(rle_v2_decode(rle_v2_encode(v), len(v)), v)


@given(st.lists(st.booleans(), min_size=1, max_size=5000))
def test_bool_rle(vals):
    v = np.array(vals, dtype=bool)
    assert np.array_equal(bool_rle_decode(bool_rle_encode(v), len(v)), v)


@given(st.binary(min_size=0, max_size=4000))
def test_fsst_any_bytes(raw):
    table = fsst_train(raw)
    assert fsst_decode(fsst_encode(raw, table), table) == raw


@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=400))
def test_stripe_string_column(vals):
    arr = pa.array(vals, type=pa.string())
    blob, stats = encode_column(arr)
    assert decode_column(blob, pa.string()).equals(arr)


@given(st.lists(st.one_of(st.none(), st.lists(i32, max_size=30)), min_size=1, max_size=300))
def test_stripe_token_column(vals):
    arr = pa.array(vals, type=pa.list_(pa.int32()))
    blob, stats = encode_column(arr)
    assert decode_column(blob, pa.list_(pa.int32())).equals(arr)


@given(st.lists(st.one_of(st.none(), i64), min_size=1, max_size=800))
def test_stripe_int_column(vals):
    arr = pa.array(vals, type=pa.int64())
    blob, stats = encode_column(arr)
    assert decode_column(blob, pa.int64()).equals(arr)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["sorted", "const", "rand", "desc"]),
            st.integers(min_value=1, max_value=900),
        ),
        min_size=1,
        max_size=8,
    ),
    st.randoms(use_true_random=False),
)
def test_rlev2_segment_shapes(segs, rnd):
    """Concatenations of sorted / constant / random / descending
    segments — the shapes that route through every planner path of the
    r5 one-pass literal planner (batched DIRECT runs, DELTA blob,
    direct-tail blob, SR chains, PATCHED_BASE) in one stream."""
    parts = []
    for kind, m in segs:
        base = rnd.randrange(-(10**6), 10**6)
        if kind == "sorted":
            parts.append(np.sort(np.array([rnd.randrange(0, 10**7) for _ in range(m)], dtype=np.int64)))
        elif kind == "desc":
            parts.append(-np.sort(np.array([rnd.randrange(0, 10**7) for _ in range(m)], dtype=np.int64)))
        elif kind == "const":
            parts.append(np.full(m, base, dtype=np.int64))
        else:
            a = np.array([rnd.randrange(0, 50257) for _ in range(m)], dtype=np.int64)
            a[::97] = 10**13  # outliers -> PATCHED_BASE candidates
            parts.append(a)
    v = np.concatenate(parts)
    for signed in (True, False):
        vv = np.abs(v) if not signed else v
        enc = rle_v2_encode(vv, signed=signed)
        assert np.array_equal(rle_v2_decode(enc, len(vv), signed=signed), vv)
