"""E9 — per-stripe × per-column codec auto-selection from sampled stats.

Mirrors the ORC writer heuristics verified in SURVEY.md §4.3:
- dictionary iff distinct/total <= 0.8 (ORC Java default threshold),
  decided on a bounded sample;
- RLEv2 sub-mode choice happens per 512-value window inside the RLEv2
  encoder (codecs/rlev2.py);
- frame-of-reference + plain bit-packing when the value *range* is much
  narrower than the zigzag magnitude (beats ORC's DIRECT there);
- FSST for high-cardinality strings when a trained table actually saves
  space, else direct lengths+blob.

All stats are numpy-vectorized; strings sample at most ``_SAMPLE`` values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from datafusion_orc_spark.codecs.bitpack import bit_widths, closest_fixed_width

DICT_KEY_RATIO = 0.8  # ORC Java hive.exec.orc.dictionary.key.size.threshold
_SAMPLE = 4096


def int_stats(vals: np.ndarray, vmin: int | None = None, vmax: int | None = None) -> dict:
    """Stats over a (non-null) int64 view: range, widths, run/monotone shape.

    ``vmin``/``vmax``: optional precomputed min/max (the stripe stats pass
    already made those reductions — don't repeat two full-array passes)."""
    n = len(vals)
    if n == 0:
        return {"n": 0, "min": 0, "max": 0, "runs": 0, "monotonic": True, "w_direct": 1, "w_for": 1}
    mn = int(vmin) if vmin is not None else int(vals.min())
    mx = int(vmax) if vmax is not None else int(vals.max())
    sample = vals[: min(n, _SAMPLE)]
    d = np.diff(sample.astype(np.int64, copy=False))
    runs = int((d != 0).sum()) + 1
    monotonic = bool(np.all(d >= 0) or np.all(d <= 0))
    # zigzag is maximal at max |value|, so the DIRECT width comes from
    # the min/max scalars — no full-array pass
    zz = max((mn << 1) ^ (mn >> 63) if mn < 0 else mn << 1, mx << 1 if mx >= 0 else ((mx << 1) ^ (mx >> 63)))
    w_direct = closest_fixed_width(max(1, int(zz).bit_length()))
    span = mx - mn
    w_for = closest_fixed_width(max(1, span.bit_length())) if span >= 0 else 64
    # outlier detection: p90 width of min-subtracted sample vs full range
    with np.errstate(over="ignore"):
        reduced = (sample.astype(np.int64, copy=False) - np.int64(mn)).view(np.uint64)
    w90 = closest_fixed_width(int(np.percentile(bit_widths(reduced), 90)))
    return {
        "n": n, "min": mn, "max": mx, "runs": runs, "monotonic": monotonic,
        "w_direct": w_direct, "w_for": w_for, "w90_for": w90,
    }


def choose_int_codec(
    vals: np.ndarray, vmin: int | None = None, vmax: int | None = None
) -> tuple[str, dict]:
    """-> ("int_rle2" | "int_for_bp", stats).

    RLEv2 wins on runs / monotonic / outlier shapes (its window chooser
    picks SR/DELTA/PB); explicit FoR+bitpack wins when values are a dense
    band far from zero (w_for << w_direct) with no run structure.
    """
    s = int_stats(vals, vmin=vmin, vmax=vmax)
    if s["n"] == 0:
        return "int_rle2", s
    sample_n = min(s["n"], _SAMPLE)
    run_heavy = s["runs"] < sample_n / 2
    if s["monotonic"] or run_heavy:
        return "int_rle2", s
    if s["w90_for"] + 1 < s["w_for"]:
        return "int_rle2", s  # outlier shape: RLEv2 PATCHED_BASE wins
    if s["w_for"] + 1 < s["w_direct"]:
        return "int_for_bp", s
    return "int_rle2", s


def string_stats(arr: pa.Array) -> dict:
    n = len(arr)
    sample = arr.slice(0, min(n, _SAMPLE))
    import pyarrow.compute as pc

    distinct = pc.count_distinct(sample).as_py() if n else 0
    total_bytes = pc.sum(pc.binary_length(arr.cast(pa.large_binary()))).as_py() if n else 0
    return {"n": n, "sample_distinct": distinct, "sample_n": len(sample), "total_bytes": total_bytes or 0}


def choose_string_codec(arr: pa.Array) -> tuple[str, dict]:
    """-> ("str_dict" | "str_fsst" | "str_direct", stats)."""
    s = string_stats(arr)
    if s["n"] == 0:
        return "str_direct", s
    if s["sample_distinct"] / max(1, s["sample_n"]) <= DICT_KEY_RATIO and s["sample_distinct"] <= 1 << 20:
        return "str_dict", s
    avg_len = s["total_bytes"] / max(1, s["n"])
    if avg_len >= 4:
        return "str_fsst", s  # encode path falls back to direct if unprofitable
    return "str_direct", s
