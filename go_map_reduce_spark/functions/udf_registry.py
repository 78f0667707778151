"""User-function registry: the reference's pluggable-UDF surface on Spark.

The reference's whole extension model is user-supplied functions loaded
at runtime (Go plugin dlopen, main/mrworker.go:34-51; Map/Reduce symbol
lookup). Spark's equivalents, demonstrated here:

- Python callables passed to the parity API (parity.run_job) — direct
  analog, already covered;
- `spark.udf.register` exposing functions to the SQL surface — this
  module. Pandas UDFs (Arrow-vectorized) are the only registration
  flavor offered: row-at-a-time Python UDFs are banned from this
  codebase's hot paths by policy (PERFORMANCE.md).

Registered functions (SQL namespace `gmrs_*`):
- gmrs_tokenize(text) -> array<string>   letter-run tokenizer (wc.go:23-26 semantics)
- gmrs_token_count(text) -> bigint       token count
- gmrs_quality(text) -> double           letters-per-char quality ratio
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession, functions as F, types as T

TOKEN_RE = "[^A-Za-z]+"


def register_udfs(spark: SparkSession) -> None:
    """Idemptently register the gmrs_* pandas UDFs for SQL use."""
    import re

    rx = re.compile(TOKEN_RE)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def gmrs_tokenize(s: pd.Series) -> pd.Series:
        return s.map(lambda t: [w for w in rx.split(t or "") if w])

    @F.pandas_udf(T.LongType())
    def gmrs_token_count(s: pd.Series) -> pd.Series:
        return s.map(lambda t: sum(1 for w in rx.split(t or "") if w)).astype("int64")

    @F.pandas_udf(T.DoubleType())
    def gmrs_quality(s: pd.Series) -> pd.Series:
        def q(t):
            if not t:
                return 0.0
            return sum(c.isalpha() for c in t) / len(t)

        return s.map(q).astype("float64")

    spark.udf.register("gmrs_tokenize", gmrs_tokenize)
    spark.udf.register("gmrs_token_count", gmrs_token_count)
    spark.udf.register("gmrs_quality", gmrs_quality)
