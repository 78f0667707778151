"""Round-14 batch: the dialog corpus goes THROUGH the funnel.

``session_dialog_corpus`` (pipeline40) mints training documents from
event sessions — and until now they bypassed the curation disciplines
every crawled document faces.  ``dialog_corpus_funnel`` closes that:
the bridge docs get a quality gate and an exact-transcript dedup, with
drops attributed per "source" in the ``curation_funnel_by_source``
shape.  The dialog corpus's source axis is the session's MODAL turn
type (most frequent event_type, count desc / type asc tie — the
kanonymity top_type convention applied per session): "which
interaction channel is the gate/dedup eating" is the same question
the crawl funnel answers per crawl.

Stages, in the standing first-failing attribution order:

- gate: a transcript shorter than DIALOG_MIN_CHARS characters carries
  no learnable structure (single cheap turns like 'error@71') — the
  length-gate analog of doc_quality_composite_gate's floor.
- dedup: IDENTICAL transcripts (equal text — in practice repeated
  single-turn sessions emitting the same type@cents) keep one
  canonical copy: the (user_id, session_id)-minimal doc per
  md5(text) group, evaluated over ALL bridge docs independently of
  the gate (the staged-decision discipline: stage verdicts are
  independent, attribution is ordered).

Reconciliation (pytest-pinned): Σ docs_in across sources equals the
dialog corpus's row count exactly — every minted bridge doc enters
the funnel once — and the funnel telescopes per source.

100 TB shape: the modal-type frame is one map-side-combinable
aggregate over the events×sessions join the corpus itself performs;
the dedup window shuffles the 32-byte md5, never transcript bodies
(the training_corpus_selection convention); the funnel is one
aggregate over the #sessions-row bridge frame.

Reference anchor: the funnel-shape is mrapps/wc.go's per-key
aggregation over a derived corpus; the composition discipline is the
repo's own pipeline27/40 capstones."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.events import user_sessions
from go_map_reduce_spark.operators.pipeline40 import session_dialog_corpus
from go_map_reduce_spark.registry import ORACLES, query

DIALOG_MIN_CHARS = 9  # transcripts below this carry no learnable turns


@query(
    "dialog_corpus_funnel",
    oracle=f"""
    WITH s AS ({ORACLES["user_sessions"]}),
    corpus AS ({ORACLES["session_dialog_corpus"]}),
    j AS (
      SELECT e.user_id, s.session_id, e.event_type
      FROM events e
      JOIN s ON s.user_id = e.user_id
            AND e.ts >= s.session_start AND e.ts <= s.session_end
    ),
    tc AS (
      SELECT user_id, session_id, event_type, COUNT(*) AS c
      FROM j GROUP BY user_id, session_id, event_type
    ),
    top AS (
      SELECT user_id, session_id, event_type AS top_type FROM (
        SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY c DESC, event_type) AS rk
        FROM tc
      ) WHERE rk = 1
    ),
    b AS (
      SELECT c.user_id, c.session_id, c.n_turns, c.n_chars, c.text,
             t.top_type, (c.n_chars >= {DIALOG_MIN_CHARS}) AS gate_ok
      FROM corpus c
      JOIN top t ON t.user_id = c.user_id AND t.session_id = c.session_id
    ),
    k AS (
      SELECT user_id, session_id,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY user_id, session_id) AS rk
      FROM b
    ),
    d AS (
      SELECT b.top_type, b.gate_ok, b.n_turns, (k.rk = 1) AS dedup_ok
      FROM b JOIN k ON k.user_id = b.user_id
                   AND k.session_id = b.session_id
    )
    SELECT top_type AS source,
           CAST(COUNT(*) AS BIGINT) AS docs_in,
           CAST(SUM(CASE WHEN NOT gate_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS gate_dropped,
           CAST(SUM(CASE WHEN gate_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS dedup_dropped,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_kept,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok THEN n_turns ELSE 0 END)
                AS BIGINT) AS turns_kept
    FROM d GROUP BY top_type
    """,
)
def dialog_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bridge documents through the curation disciplines (module
    docstring): per modal turn type — docs in, gate drops, exact-dup
    drops (first-failing attribution), docs and turns kept.  The
    funnel telescopes per source and Σ docs_in equals the dialog
    corpus row count (pytest-pinned), so minting and curating cannot
    drift."""
    corpus = session_dialog_corpus(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    sess = user_sessions(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    j = ev.join(sess, "user_id").where(
        (F.col("ts") >= F.col("session_start"))
        & (F.col("ts") <= F.col("session_end"))
    )
    tc = j.groupBy("user_id", "session_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_top = W.partitionBy("user_id", "session_id").orderBy(
        F.desc("c"), "event_type"
    )
    top = (
        tc.withColumn("rk", F.row_number().over(w_top))
        .where(F.col("rk") == 1)
        .select("user_id", "session_id", F.col("event_type").alias("top_type"))
    )
    b = corpus.join(top, ["user_id", "session_id"]).select(
        "user_id",
        "session_id",
        "n_turns",
        "top_type",
        "text",
        (F.col("n_chars") >= DIALOG_MIN_CHARS).alias("gate_ok"),
    )
    w_dup = W.partitionBy(F.md5("text")).orderBy("user_id", "session_id")
    d = b.withColumn("dedup_ok", F.row_number().over(w_dup) == 1)
    gate, ddp = F.col("gate_ok"), F.col("dedup_ok")
    return d.groupBy(F.col("top_type").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("docs_in"),
        F.sum((~gate).cast("long")).cast("long").alias("gate_dropped"),
        F.sum((gate & ~ddp).cast("long")).cast("long").alias("dedup_dropped"),
        F.sum((gate & ddp).cast("long")).cast("long").alias("docs_kept"),
        F.sum(F.when(gate & ddp, F.col("n_turns")).otherwise(0))
        .cast("long")
        .alias("turns_kept"),
    )
