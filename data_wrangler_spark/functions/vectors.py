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

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ, deterministic left-to-right order.

    With `dim` known, the sum unrolls to a flat 2·dim-term codegen
    expression — higher-order-function lambdas evaluate interpreted,
    per element, and are ~50× slower on pair joins (measured). The
    unrolled form adds in the identical left-assoc order, so results
    are bit-equal to the fold (and to the oracle's list_reduce)."""
    if dim is not None:
        expr = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            expr = expr + F.element_at(a, i) * F.element_at(b, i)
        return expr
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def embedding_dim(df, col: str = "embedding") -> int:
    """Fixed embedding dimensionality (one-row lookup; at scale this
    is table metadata)."""
    row = df.select(F.size(col).alias("d")).first()
    return int(row["d"])


def make_dot_udf():
    """Arrow-vectorized dot product for PAIR-join hot paths.

    Why not pure codegen: a 64-dim unrolled dot is one ~130-term
    arithmetic expression; whole-stage codegen emits it as a single
    JVM method beyond HotSpot's JIT bytecode limit, so it executes as
    interpreted bytecode (measured 41 s for 2M pairs vs 1 s for a
    16-term expression — and Catalyst cannot split one Add-tree).
    numpy over Arrow batches does the same 2M×64 multiply-adds in
    ~1 s. Summation order differs from a sequential fold, so every
    consumer MUST round the resulting cosine (round6 below) and the
    oracle must round identically — the 1e-6 quantum is 9 orders
    above the worst-case order-dependence of a 64-term double sum.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return dot_udf


def round6(col: Column) -> Column:
    """Round-half-up at 1e-6 via floor arithmetic — portable between
    Spark and DuckDB (F.round / ROUND disagree on binary boundaries)."""
    return F.floor(col * 1_000_000 + F.lit(0.5)).cast("double") / 1_000_000


def sql_round6(expr: str) -> str:
    return f"(floor({expr} * 1000000 + 0.5) / 1000000)"


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


def micro_csv(col: Column | str) -> Column:
    """Numeric array → canonical string: each element rounded to
    integer micro-units (floor(x·1e6 + 0.5) — identical IEEE-754
    arithmetic in every engine, unlike decimal internals or float
    formatting) and comma-joined. Harness-safe scalar output for
    array-valued results: comparators that hash cells can't handle
    list cells, and double→string formatting differs across engines,
    but this fixed-point CSV is byte-identical everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(
            c,
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
        ),
        ",",
    )


def sql_micro_csv(list_expr: str) -> str:
    """DuckDB mirror of micro_csv — same floor(x·1e6+0.5) fixed-point
    per element, comma-joined."""
    return (
        f"array_to_string(list_transform({list_expr}, x -> "
        f"CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) "
        f"AS VARCHAR)), ',')"
    )
