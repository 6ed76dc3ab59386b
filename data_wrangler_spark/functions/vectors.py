"""Vector math over `array<float>` columns — all JVM-side built-ins.

These are the primitives the similarity/dedup operators compose. No
UDFs: `zip_with` + `aggregate` keep the arithmetic inside codegen, and
the sequential left fold is bit-identical to the DuckDB oracle's
`list_reduce` (0.0 + x == x exactly, so the differing init conventions
agree).

Scale note: brute-force cosine is O(n·d) per query vector and
embarrassingly parallel; the pair-join variants are O(n²·d) and must
be blocked (label/LSH bucket) before the cosine — see similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB SQL mirrors of the same folds (for oracle strings). The
# two-arg lambda index `i` is 1-based, matching element order exactly.
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform({a}, (x, i) -> CAST(x AS DOUBLE) * "
        f"CAST({b}[i] AS DOUBLE)), (p, q) -> p + q)"
    )


def sql_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), (p, q) -> p + q))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
