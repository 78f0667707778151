"""Vector similarity helpers over ArrayType(FloatType) embedding columns.

Cross-engine determinism design: a dot product is a sum of 64 float
products. Distributed double summation is order-sensitive, but a
*sequential left-to-right fold* is fully deterministic — and both
engines expose exactly that primitive (Spark `aggregate`, DuckDB
`list_reduce`, both defined as in-order folds). Per-element float
multiplication is IEEE-exact and identical across engines, each product
is promoted to double before accumulating, so the fold produces
bit-identical doubles on both sides. The final norm/sqrt/divide are
single IEEE double ops (sqrt is correctly-rounded per IEEE 754);
cosines are additionally rounded to 6dp at the boundary.

These run as native Catalyst higher-order functions (zip_with /
aggregate) — JVM codegen over the array, no Python, no explode: the
64-element loop stays inside one expression per row.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x * y).cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    """Sequential-fold sum of squares, as double."""
    return dot_product(a, a)


def cosine(a: Column, b: Column, a_norm_sq: Column, b_norm_sq: Column) -> Column:
    """Cosine from a precomputed pair of squared norms, rounded to 6dp."""
    return F.round(
        dot_product(a, b) / (F.sqrt(a_norm_sq) * F.sqrt(b_norm_sq)), 6
    )


# ---- DuckDB oracle twins (same arithmetic, SQL text) ----------------------

def sql_dot(a: str, b: str, dims: int = 64) -> str:
    """In-order fold dot product: list_reduce is a sequential
    left-to-right fold, matching Spark's `aggregate` order exactly."""
    return (
        f"list_reduce(list_transform(range(1, {dims + 1}), "
        f"i -> CAST({a}[i] * {b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def sql_cosine(a: str, b: str, a_nsq: str, b_nsq: str, dims: int = 64) -> str:
    return f"round({sql_dot(a, b, dims)} / (sqrt({a_nsq}) * sqrt({b_nsq})), 6)"
