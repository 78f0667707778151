"""Round-14: dialog_corpus_funnel — the minted dialog corpus goes
through the curation disciplines instead of bypassing them."""

from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["dialog_corpus_funnel"](spark, sf_dir),
        ORACLES["dialog_corpus_funnel"],
        sf_dir,
    )


def test_funnel_telescopes_and_reconciles_with_corpus(spark, sf_dir):
    """Per source the funnel telescopes (docs_in = gate + dedup +
    kept), and Σ docs_in equals the dialog corpus row count EXACTLY —
    every minted bridge doc enters the funnel once; minting and
    curating cannot drift."""
    rows = QUERIES["dialog_corpus_funnel"](spark, sf_dir).collect()
    assert rows, "funnel must produce per-source rows"
    for r in rows:
        assert r["docs_in"] == (
            r["gate_dropped"] + r["dedup_dropped"] + r["docs_kept"]
        ), r
        assert r["turns_kept"] >= r["docs_kept"] >= 0, r
    n_corpus = QUERIES["session_dialog_corpus"](spark, sf_dir).count()
    assert sum(r["docs_in"] for r in rows) == n_corpus
    # the disciplines are non-vacuous on the fixtures: something gates
    # out and (identical single-turn transcripts exist) something dedups
    assert sum(r["gate_dropped"] for r in rows) > 0
    assert sum(r["dedup_dropped"] for r in rows) > 0


def test_exactly_one_keeper_per_transcript(spark, sf_dir):
    """The exact-dup stage keeps exactly one bridge doc per distinct
    transcript among the gate-passers whose text also passes — i.e.
    kept docs have globally unique texts."""
    from go_map_reduce_spark.operators.pipeline40 import (
        session_dialog_corpus,
    )
    from go_map_reduce_spark.operators.pipeline42 import DIALOG_MIN_CHARS

    corpus = session_dialog_corpus(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("user_id", "session_id")
    kept = (
        corpus.withColumn("rk", F.row_number().over(w))
        .where(
            (F.col("rk") == 1) & (F.col("n_chars") >= DIALOG_MIN_CHARS)
        )
    )
    n_kept_expected = kept.count()
    rows = QUERIES["dialog_corpus_funnel"](spark, sf_dir).collect()
    assert sum(r["docs_kept"] for r in rows) == n_kept_expected
    # texts of kept docs are globally unique
    assert (
        kept.groupBy("text").count().where(F.col("count") > 1).count() == 0
    )
