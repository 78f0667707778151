"""Round-7 operators (pipeline25): the substring-dedup CUT and the
corpus-scale BPE tokenize pass — differential tests against the DuckDB
oracles plus property tests that would catch both engines agreeing on
the wrong answer (a composed dup-goes-to-zero check for the cut; an
independent sequential-Python BPE reference for the tokenizer)."""

import os

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["substring_dup_cut", "bpe_corpus_tokenize"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


# ---------------------------------------------------------------------------
# substring_dup_cut
# ---------------------------------------------------------------------------


def test_cut_drives_composed_dup_frac_to_zero(spark, sf_dir, tmp_path):
    """The whole point of the operator, measured by composing the
    registered DIAGNOSTIC (direct import) on the operator's own
    output: after cutting, re-running cross_doc_repeated_spans on the
    cleaned corpus must find (almost) no cross-document duplicated
    windows. On this corpus the residue is exactly zero; the bound
    allows a sliver for windows accidentally re-formed by token
    re-joining around cut regions."""
    from go_map_reduce_spark.operators.pipeline22 import (
        cross_doc_repeated_spans,
    )
    from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut

    before = cross_doc_repeated_spans(spark, sf_dir).agg(
        F.sum("dup_windows").alias("d"), F.sum("n_windows").alias("n")
    ).first()
    before_frac = before["d"] / before["n"]
    assert before_frac > 0.01  # the corpus genuinely has cross-doc dup

    cleaned_dir = str(tmp_path / "cleaned")
    substring_dup_cut(spark, sf_dir).select(
        "doc_id", F.col("cleaned_text").alias("text")
    ).write.mode("overwrite").parquet(
        os.path.join(cleaned_dir, "documents.parquet")
    )
    after = cross_doc_repeated_spans(spark, cleaned_dir).agg(
        F.sum("dup_windows").alias("d"), F.sum("n_windows").alias("n")
    ).first()
    after_frac = (after["d"] or 0) / after["n"]
    assert after_frac < 0.1 * before_frac


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i + 1, t, "en") for i, t in enumerate(rows)],
        "doc_id: long, text: string, lang: string",
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def test_cut_semantics_on_synthetic_corpus(spark, tmp_path):
    """Hand-checkable corpus: two docs sharing exactly one 5-token
    span, one unique doc. Exactly one of the two occurrences is cut
    (5 tokens), the other survives verbatim somewhere, and the unique
    doc is untouched."""
    from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut

    d = str(tmp_path / "syn")
    _write_docs(
        spark,
        d,
        [
            "a b c d e x1 x2",
            "z1 a b c d e z2",
            "u1 u2 u3 u4 u5 u6",
        ],
    )
    out = {r["doc_id"]: r for r in substring_dup_cut(spark, d).collect()}
    assert len(out) == 3
    # unique doc untouched
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "u1 u2 u3 u4 u5 u6"
    # exactly one occurrence of the shared span was cut: 5 tokens from
    # exactly one of the two docs, zero from the other
    removed = sorted((out[1]["n_removed"], out[2]["n_removed"]))
    assert removed == [0, 5]
    # the canonical copy survives: "a b c d e" still occurs in exactly
    # one cleaned text
    survivors = sum(
        "a b c d e" in out[i]["cleaned_text"] for i in (1, 2)
    )
    assert survivors == 1


def test_cut_is_deterministic_across_runs(spark, sf_dir):
    """md5-rank canonical selection must make the winner — and so the
    whole output — identical on re-execution (the driver runs queries
    more than once)."""
    from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut

    a = sorted(map(tuple, substring_dup_cut(spark, sf_dir).collect()))
    b = sorted(map(tuple, substring_dup_cut(spark, sf_dir).collect()))
    assert a == b


def test_cut_plan_has_no_cartesian_and_no_token_array_shuffle(spark, sf_dir):
    """Scale guards: no cartesian product anywhere, and neither the
    document token array NOR the variable-length window text may
    travel through ANY exchange — window extraction folds the text
    into the fixed-width 60-bit wkey before the first shuffle, so
    every exchange carries only fixed-width keys (doc_id, pos, wkey,
    the 32-char rk hash) and int-set columns, and reassembly consumes
    the token array on the scan side of a broadcast join. Asserted
    against the formatted plan's per-Exchange Input lists (the same
    property the r06 verdict flagged keyword_in_context for
    violating)."""
    import contextlib
    import io
    import re

    # r15: the registered query memoizes the built frame (shared_frame),
    # so its own plan is a checkpoint-block scan — the scale guards
    # apply to the BUILD plan, exposed as _cut_plan.
    from go_map_reduce_spark.operators.pipeline25 import _cut_plan

    df = _cut_plan(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    blocks = re.split(r"\n(?=\(\d+\) )", buf.getvalue())
    exchanges = [
        b for b in blocks
        if re.match(r"\(\d+\) (Exchange|BroadcastExchange)\b", b)
    ]
    assert exchanges  # the plan shape changed if none parse
    for b in exchanges:
        inputs = "\n".join(
            line for line in b.splitlines() if line.startswith("Input")
        )
        # the token array is t#N and the window text win#N in this
        # plan; no exchange may carry either
        assert not re.search(r"\bt#\d+", inputs), b
        assert not re.search(r"\bwin#\d+", inputs), b


# ---------------------------------------------------------------------------
# bpe_corpus_tokenize
# ---------------------------------------------------------------------------


def _bpe_reference(corpus):
    """Sequential pure-Python reference: pipeline9's trainer semantics
    (pair count -> (count desc, pair asc) winner -> greedy left-to-right
    fold with chr(31) glue), applied for BPE_ROUNDS rounds."""
    from go_map_reduce_spark.operators.pipeline9 import BPE_ROUNDS

    docs = [t.split() for t in corpus]
    docs = [d for d in docs if d]
    for _ in range(BPE_ROUNDS):
        counts = {}
        for d in docs:
            for x, y in zip(d, d[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        a, b = min(counts, key=lambda p: (-counts[p], p[0], p[1]))

        def apply(d):
            acc = d[0]
            for x in d[1:]:
                if (acc == a or acc.endswith(" " + a)) and x == b:
                    acc += "\x1f" + x
                else:
                    acc += " " + x
            return acc.split(" ")

        docs = [apply(d) for d in docs]
    return docs


def test_bpe_tokenize_matches_sequential_reference(spark, tmp_path):
    """Independent differential: a driver-side sequential BPE (train +
    apply) on a synthetic corpus with known merge structure must agree
    with the distributed nested-fold application on totals."""
    from go_map_reduce_spark.operators.pipeline25 import bpe_corpus_tokenize

    corpus = [
        "a a a a b",          # run of merges: greedy fold must pair 2, not 3
        "a b a b c c",
        "c c c a b",
        "x y x y x y",
        "solo",
    ]
    d = str(tmp_path / "bpe")
    _write_docs(spark, d, corpus)
    ref = _bpe_reference(corpus)
    exp_tokens = sum(len(x) for x in ref)
    exp_words = sum(len(t.split()) for t in corpus)

    row = bpe_corpus_tokenize(spark, d).agg(
        F.sum("n_tokens").alias("t"),
        F.sum("n_words").alias("w"),
        F.sum("n_docs").alias("d"),
    ).first()
    assert row["t"] == exp_tokens
    assert row["w"] == exp_words
    assert row["d"] == len(corpus)


def test_bpe_tokenize_engines_agree_when_merges_dry_up(spark, tmp_path):
    """Degenerate corpus where training exhausts before BPE_ROUNDS:
    after round 1 merges every 'a a' pair, no adjacent pairs remain.
    The Spark loop breaks early and applies the 1-rule table; the
    unrolled oracle's exhausted rounds must pass tokens through
    (LEFT JOIN ON TRUE), not empty the corpus (the CROSS JOIN shape
    would) — pinned here by running BOTH engines on the corpus."""
    import duckdb

    from go_map_reduce_spark.operators.pipeline25 import bpe_corpus_tokenize
    from go_map_reduce_spark.registry import ORACLES

    d = str(tmp_path / "dry")
    _write_docs(spark, d, ["a a", "a a", "a a"])
    rows = {
        r["lang"]: r for r in bpe_corpus_tokenize(spark, d).collect()
    }
    assert rows["en"]["n_docs"] == 3
    assert rows["en"]["n_words"] == 6
    assert rows["en"]["n_tokens"] == 3  # each doc merged to one token

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(d, 'documents.parquet')}/*.parquet'"
    )
    o = con.sql(ORACLES["bpe_corpus_tokenize"]).df()
    assert len(o) == 1
    assert int(o.loc[0, "n_docs"]) == 3
    assert int(o.loc[0, "n_tokens"]) == 3
    assert float(o.loc[0, "tokens_per_word"]) == rows["en"]["tokens_per_word"]


def test_bpe_tokenize_bounds(spark, sf_dir):
    """Merging only ever reduces token count: per lang,
    0 < n_tokens <= n_words, and tokens_per_word in (0, 1]."""
    from go_map_reduce_spark.operators.pipeline25 import bpe_corpus_tokenize

    rows = bpe_corpus_tokenize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_tokens"] <= r["n_words"]
        assert 0.0 < r["tokens_per_word"] <= 1.0
