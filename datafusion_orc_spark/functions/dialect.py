"""Shared Spark-SQL / DuckDB-SQL expression fragments.

The training-pipeline operators are expressed once per dialect from the
same building blocks, so the Spark query and the DuckDB oracle cannot
drift. Spark names: transform/filter/array_min/...; DuckDB names:
list_transform/list_filter/list_min/...
"""

from __future__ import annotations

VOCAB = 50257
FP_PRIME = 1_000_000_007

# (spark, duckdb) function-name pairs
_FN = {
    "transform": ("transform", "list_transform"),
    "filter": ("filter", "list_filter"),
    "amin": ("array_min", "list_min"),
    "asum": ("aggregate({l}, 0L, (a, x) -> a + x)", "CAST(list_sum({l}) AS BIGINT)"),
    "split": ("split(text, ' ')", "string_split(text, ' ')"),
    "contains": ("array_contains(array({items}), w)", "list_contains([{items}], w)"),
}


def words(d: int) -> str:
    """Non-empty whitespace words of `text`. d=0 spark, d=1 duckdb."""
    return f"{_FN['filter'][d]}({_FN['split'][d]}, w -> w <> '')"


def tok_lambda(var: str = "w") -> str:
    """The deterministic word-hash token (identical syntax in both)."""
    return (
        f"CAST((length({var})*131 + ascii(substr({var}, 1, 1))*31 "
        f"+ ascii(substr({var}, length({var}), 1))*7) % {VOCAB} AS INTEGER)"
    )


def tokens(d: int) -> str:
    return f"{_FN['transform'][d]}({words(d)}, w -> {tok_lambda('w')})"


def list_sum(d: int, lst: str) -> str:
    return _FN["asum"][d].format(l=lst)


def list_min(d: int, lst: str) -> str:
    return f"{_FN['amin'][d]}({lst})"


def list_transform(d: int, lst: str, lam: str) -> str:
    return f"{_FN['transform'][d]}({lst}, {lam})"


def stopword_hits(d: int, words_expr: str, stopwords: list[str]) -> str:
    items = ", ".join(f"'{w}'" for w in stopwords)
    contains = _FN["contains"][d].format(items=items)
    return f"size({_FN['filter'][d]}({words_expr}, w -> {contains}))" if d == 0 else (
        f"len({_FN['filter'][d]}({words_expr}, w -> {contains}))"
    )


def minhash(d: int, toks: str, a: int, b: int, prime: int = FP_PRIME) -> str:
    """min over tokens of (a*t + b) % prime — a classic MinHash permutation."""
    lam = f"t -> (CAST(t AS BIGINT) * {a} + {b}) % {prime}"
    return list_min(d, list_transform(d, toks, lam))


def simhash_bit(d: int, toks: str, bit: int) -> str:
    """Sign of sum over tokens of (+1 / -1 for bit set/clear).

    Bit test via modulo (portable: Spark SQL has no >> operator):
    bit b of non-negative t is set iff t % 2^(b+1) >= 2^b.
    """
    lam = (
        f"t -> CAST((CASE WHEN t % {1 << (bit + 1)} >= {1 << bit} "
        f"THEN 1 ELSE -1 END) AS BIGINT)"
    )
    total = list_sum(d, list_transform(d, toks, lam))
    return f"(CASE WHEN {total} >= 0 THEN 1 ELSE 0 END)"


def simhash(d: int, toks: str, bits: int = 16) -> str:
    terms = " + ".join(f"{simhash_bit(d, toks, b)} * {1 << b}" for b in range(bits))
    return f"({terms})"


# --- integer sign-projection LSH (embedding dedup / ANN scale path) ------
#
# Hyperplane weights are deterministic integers (LCG over the plane/dim
# index), and the projected vector is the 1e3-quantized embedding — the
# whole bucket computation is exact integer arithmetic, so Spark and
# DuckDB produce IDENTICAL buckets (a float sin()-based projection can
# flip sign between engines at ulp distance and break the oracle).

def lsh_weights(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random weights in [-1000, 1000]."""
    return [
        ((1103515245 * (plane * 1009 + i) + 12345) % 2001) - 1000
        for i in range(dim)
    ]


def lsh_projection(d: int, qcol: str, plane: int, dim: int) -> str:
    """Integer dot product of quantized embedding `qcol` with plane weights."""
    w = lsh_weights(plane, dim)
    if d == 0:  # spark
        arr = "array(" + ", ".join(f"{v}L" for v in w) + ")"
        return (
            f"aggregate(zip_with({qcol}, {arr}, (x, y) -> x * y), "
            f"0L, (a, v) -> a + v)"
        )
    arr = "[" + ", ".join(str(v) for v in w) + "]"
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> {qcol}[i] * ({arr})[i]))"
    )


def lsh_band_bucket(d: int, qcol: str, band: int, bits_per_band: int, dim: int) -> str:
    """Bucket id for one band: `bits_per_band` sign bits packed into an int."""
    terms = []
    for j in range(bits_per_band):
        proj = lsh_projection(d, qcol, band * bits_per_band + j, dim)
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
