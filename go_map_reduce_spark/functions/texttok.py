"""Tokenization shared by the text operators.

The reference tokenizes by splitting on non-letter runes
(strings.FieldsFunc with unicode.IsLetter, mrapps/wc.go:23-26). We use
the ASCII-stable class [^A-Za-z]+ on both the Spark side and the DuckDB
oracle side so the two engines split identically (SURVEY.md §7 "hard
parts" (3)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT_RE = "[^A-Za-z]+"


def tokens(col: Column) -> Column:
    """Array of letter-run tokens; may contain '' at the edges (filter it)."""
    return F.split(col, TOKEN_SPLIT_RE)


def exploded_tokens(df: DataFrame, text_col: str = "text", out: str = "word") -> DataFrame:
    """One row per non-empty token. Keeps all other columns."""
    return df.withColumn(out, F.explode(tokens(F.col(text_col)))).where(F.col(out) != "")


def kgrams(tk: Column, k: int) -> Column:
    """Space-joined K-gram array from a token-array COLUMN (not an
    inline expression — project the tokenization first so it isn't
    re-evaluated per reference).

    Built as a zip_with fold over K shifted views: K slices +
    (K-1) element-wise concats — linear per row. The obvious
    `transform(sequence(0, n-K), i -> concat_ws(' ', slice(toks, i+1,
    k)))` is quadratic (one array copy per position, interpreted lambda
    per index): measured 7.2 s vs 0.8 s over the sf0.1 corpus on one
    core. Rows with fewer than k tokens yield an empty array — callers
    pick their own short-doc policy."""
    m = F.size(tk) - (k - 1)
    acc = F.slice(tk, 1, m)
    for i in range(2, k + 1):
        acc = F.zip_with(
            acc, F.slice(tk, i, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return acc


# DuckDB oracle twin: FROM <table>, one row per non-empty token `word`.
def sql_exploded_tokens(table: str = "documents", text_col: str = "text") -> str:
    return (
        f"(SELECT *, unnest(regexp_split_to_array({text_col}, '{TOKEN_SPLIT_RE}')) AS word "
        f"FROM {table}) t WHERE word <> ''"
    )
