"""Cross-stripe FSST generation cache (round-5 roadmap item): later
stripes of the same column replay cached generation rewrites instead of
re-training — halving per-stripe cost at bounded size regression, with a
ratio self-check that retrains on dissimilar data."""

import time

import numpy as np
import pytest

from datafusion_orc_spark.codecs import strings as S


def _doc_ids(n, seed, prefix="doc"):
    rng = np.random.default_rng(seed)
    vals = [f"{prefix}-{i:012d}".encode() for i in rng.integers(0, 10**9, n)]
    blob = b"".join(vals)
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    return blob, lengths


@pytest.fixture(autouse=True)
def _clean_cache():
    S.fsst_cache_clear()
    yield
    S.fsst_cache_clear()


def test_reuse_roundtrips_and_bounds_size():
    blob_a, len_a = _doc_ids(7501, seed=1)
    blob_b, len_b = _doc_ids(7501, seed=2)  # similar shape, different ids
    tbl_a, data_a = S.fsst_compress_column(blob_a, len_a, cache_key="doc_id")
    assert S._FSST_GEN_CACHE["doc_id"].uses == 0
    tbl_b, data_b = S.fsst_compress_column(blob_b, len_b, cache_key="doc_id")
    assert S._FSST_GEN_CACHE["doc_id"].uses == 1  # the cached path ran
    assert tbl_b == tbl_a  # reuse serializes the CACHED table
    # decode round-trips exactly
    t = S.FsstTable.deserialize(tbl_b)
    assert S.fsst_decode(data_b, t) == blob_b
    # <=1% size regression vs a fresh train of stripe B
    S.fsst_cache_clear()
    tbl_f, data_f = S.fsst_compress_column(blob_b, len_b)
    assert len(data_b) + len(tbl_b) <= 1.01 * (len(data_f) + len(tbl_f))


def test_dissimilar_stripe_triggers_retrain():
    blob_a, len_a = _doc_ids(5000, seed=1)
    S.fsst_compress_column(blob_a, len_a, cache_key="col")
    # totally different content: the ratio self-check must reject reuse
    rng = np.random.default_rng(3)
    vals = [bytes(rng.integers(0, 256, 24, dtype=np.uint8)) for _ in range(5000)]
    blob_c = b"".join(vals)
    len_c = np.array([len(v) for v in vals], dtype=np.int64)
    res = S.fsst_compress_column(blob_c, len_c, cache_key="col")
    # random bytes are incompressible -> fresh train returns None
    # (unprofitable), and the entry must NOT have recorded a reuse
    assert res is None
    assert S._FSST_GEN_CACHE["col"].uses == 0


def test_refresh_every_retrains():
    blob_a, len_a = _doc_ids(3000, seed=1)
    S.fsst_compress_column(blob_a, len_a, cache_key="r")
    old = S._FSST_REFRESH_EVERY
    S._FSST_REFRESH_EVERY = 2
    try:
        for seed in (4, 5):  # two reuses exhaust the budget
            b, ln = _doc_ids(3000, seed=seed)
            S.fsst_compress_column(b, ln, cache_key="r")
        assert S._FSST_GEN_CACHE["r"].uses == 2
        b, ln = _doc_ids(3000, seed=6)
        S.fsst_compress_column(b, ln, cache_key="r")
        # the refresh trained fresh and re-anchored the entry
        assert S._FSST_GEN_CACHE["r"].uses == 0
    finally:
        S._FSST_REFRESH_EVERY = old


def test_reuse_is_substantially_faster():
    """The roadmap target: reused stripes skip train + selection. On the
    doc_id shape reuse measures ~10.5 ms vs ~20 ms fresh (~1.9x) — the
    assertion uses a 0.65 relative bound so best-of walls on a noisy
    machine don't flake while still catching a regression to the
    untrained-path cost."""
    blob_a, len_a = _doc_ids(7501, seed=1)
    stripes = [_doc_ids(7501, seed=s) for s in range(10, 16)]

    def best_of(fn):
        best = 9e9
        for b, ln in stripes:
            t0 = time.perf_counter()
            fn(b, ln)
            best = min(best, time.perf_counter() - t0)
        return best

    S.fsst_cache_clear()
    wall_fresh = best_of(lambda b, ln: S.fsst_compress_column(b, ln))
    S.fsst_cache_clear()
    S.fsst_compress_column(blob_a, len_a, cache_key="doc_id")  # train once
    wall_reuse = best_of(
        lambda b, ln: S.fsst_compress_column(b, ln, cache_key="doc_id")
    )
    assert S._FSST_GEN_CACHE["doc_id"].uses >= 6  # all reused
    assert wall_reuse <= 0.65 * wall_fresh, (wall_reuse, wall_fresh)
