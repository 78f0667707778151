"""Query registry: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

This is the engine's public query surface, mirrored 1:1 by
``__spark_entry__.queries()`` / ``oracle_sql()``. The oracle SQL is the
differential-test twin (the role mrsequential plays for the reference's
test harness, main/test-mr.sh:68-98): same computation, independent
engine, compared order-insensitively.

Determinism contract (carried from the reference — any collected list is
sorted before serialization, mrapps/indexer.go:37, mrapps/crash.go:51):
every registered query must be order-insensitively deterministic, and
floating-point aggregates must be computed in a summation-order-free way
(see ``functions.numeric.dsum``) so the Spark result is bit-identical to
the oracle's.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# Caller-owned persist lifecycle.
#
# Query functions return LAZY DataFrames, so a persist that the returned
# plan depends on cannot be released inside the function (nothing has
# materialized yet).  Functions register such frames with track_cache();
# whoever materializes the result (bench.py, the pytest harness, the CLI)
# calls release_caches() afterwards.  Operators that materialize
# internally (e.g. minhash_recall_eval's counts) keep unpersisting
# inline — this registry is only for persists that must outlive the
# function call.
# ---------------------------------------------------------------------------

_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted frame for caller-owned release; returns it."""
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (newest first); returns how many."""
    n = len(_LIVE_CACHES)
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL).

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible operators.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
