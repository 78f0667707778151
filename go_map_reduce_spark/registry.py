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
