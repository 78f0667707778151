"""The reference's plugin apps (SURVEY.md §2b) as Python Map/Reduce pairs.

Semantics re-expressed from the survey's behavioral description, not
translated code. Chaos/timing apps (A4 jobcount, A5 crash's fault
injection, A7/A8 mtiming/rtiming) test *machinery* Spark already
guarantees (task retry, parallelism) and have no data semantics to port
— per SURVEY.md §2b they are intentionally absent here; A5's data
shape survives as ``crash_map``/``sorted_join_reduce``.
"""

from __future__ import annotations

import re

# The reference tokenizes by splitting on non-letter *unicode* runes
# (mrapps/wc.go:23-26, unicode.IsLetter); this port deliberately uses the
# ASCII letter class instead, shared with functions/texttok.py, so the
# DuckDB oracles and the sequential oracle tokenize identically across
# engines. On non-ASCII input (accented text) the emitted keys therefore
# differ from the Go reference — a documented restriction, not a bug.
_TOKEN_RE = re.compile(r"[^A-Za-z]+")


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """A1 wc Map (mrapps/wc.go:21-34): emit (word, "1") per token."""
    return [(w, "1") for w in _TOKEN_RE.split(contents) if w]


def wc_reduce(key: str, values: list[str]) -> str:
    """A1 wc Reduce (mrapps/wc.go:41-44): count = len(values)."""
    return str(len(values))


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """A2 indexer Map (mrapps/indexer.go:20-31): per-file distinct words,
    emit (word, filename)."""
    return [(w, filename) for w in sorted({w for w in _TOKEN_RE.split(contents) if w})]


def indexer_reduce(key: str, values: list[str]) -> str:
    """A2 indexer Reduce (mrapps/indexer.go:36-39): "<n> <docs,sorted>"."""
    return f"{len(values)} {','.join(sorted(values))}"


def file_count_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """A3 early_exit Map (mrapps/early_exit.go:21-25): one pair per file
    (without the harness sleep — that tests machinery, not semantics)."""
    return [(filename, "1")]


def file_count_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


def crash_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """A5/A6 crash/nocrash emits (mrapps/crash.go:34-43, nocrash.go:22-35):
    four fixed keys with filename/content-derived values. Fault injection
    (maybeCrash) not ported — Spark task retry is the equivalent machinery."""
    return [
        ("a", filename),
        ("b", str(len(filename))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def sorted_join_reduce(key: str, values: list[str]) -> str:
    """A5/A6 Reduce (mrapps/crash.go:45-55): sort values, space-join —
    the determinism discipline every holistic reduce needs."""
    return " ".join(sorted(values))
