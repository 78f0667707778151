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


# DuckDB oracle twin: FROM <table>, one row per non-empty token `word`.
def sql_exploded_tokens(table: str = "documents", text_col: str = "text") -> str:
    return (
        f"(SELECT *, unnest(regexp_split_to_array({text_col}, '{TOKEN_SPLIT_RE}')) AS word "
        f"FROM {table}) t WHERE word <> ''"
    )
