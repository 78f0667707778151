"""Order-independent floating-point aggregation helpers.

Why: a distributed sum of doubles is not reproducible — IEEE addition is
non-associative, and partial-aggregate merge order varies run to run and
engine to engine. The reference sidesteps this by having string-only
aggregates (SURVEY.md §1); this engine instead makes float aggregates
deterministic by summing in fixed-point decimal:

    double --cast--> DECIMAL(38, s)  --SUM (exact)-->  --cast--> double

Per-row double arithmetic (products, subtractions) is IEEE-deterministic
and identical across engines, so only the *aggregation* needs the
decimal detour. The decimal cast has no rounding ties (a tie at scale s
would need the double to equal k + 5/10^(s+1) exactly, impossible for a
binary rational), so Spark's HALF_UP and DuckDB's round-to-nearest
agree bit-for-bit, and the final decimal→double cast is uniquely
determined. Cost: decimal sum instead of double sum in the partial
aggregate — still map-side-combinable, still whole-stage-codegen.

Every ``dsum``/``davg`` here has a textual twin for the DuckDB oracle
(``sql_dsum``/``sql_davg``).

MAGNITUDE LIMIT: the cross-engine cast agreement holds only while
|value|·10^scale stays well under 2^53 (i.e. |v| ≲ 1e8 at scale 6).
Near that edge the decimal boundary spacing reaches the double's own
ulp and the engines' cast algorithms round single rows differently
(observed with ~1e10 squared terms: one divergent row per ~1e5). For
large products, convert the *factors* to exact integers first and sum
integers instead — see operators/analytics.py
price_quantity_correlation.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_SCALE = 6


def dsum(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic (order-independent) sum of a double column."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic average: exact decimal sum, then one double divide."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = DEFAULT_SCALE) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = DEFAULT_SCALE) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"
