"""Round-9 pipeline operators, third batch: the TOKENIZER side of the
daily batch.

``curation_incremental_admit``/``streaming_curation_admit`` decide
which of today's documents enter the corpus; ``ivf_index_upsert`` /
``embedding_batch_drift`` fold and monitor the day's vectors; this
closes the triad for the third standing artifact a training stack
ships — the tokenizer:

- ``tokenizer_batch_drift``: YESTERDAY'S tokenizer (BPE merges
  trained on the STANDING corpus only, doc_id % 10 != 7, by the
  registered pipeline9 trainer loop) applied to both populations,
  reporting per-language fertility (tokens per word) and merge-rate
  drift of today's batch against the standing baseline.  A batch
  whose merge rate collapses under the deployed merges is content
  the vocabulary has never seen (new language, new domain, format
  corruption) — the signal that schedules tokenizer retraining,
  caught at ingest rather than as a training-loss anomaly weeks
  later.

Determinism is the pipeline9 discipline verbatim: winner per round =
(count desc, pair asc), greedy left-to-right merge fold (Spark
``aggregate`` ≡ DuckDB ``list_reduce``), chr(31) glue so a fresh
merge can't immediately re-merge; the oracle unrolls the same rounds
with the pair counts restricted to standing rows and the application
running over everyone.

Reference anchor: the daily-rerun operating model
(main/test-mr-many.sh:15-22) applied to the tokenizer artifact; the
two-population comparison is main/test-mr.sh:90's output diff
promoted to a queryable report.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.pipeline9 import (
    BPE_ROUNDS,
    _SQL_TOKS,
    _sql_apply_merge,
)
from go_map_reduce_spark.operators.pipeline20 import (
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
)
from go_map_reduce_spark.registry import query

_IS_BATCH = f"doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}"


def _doc_word_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer operators' shared base frame: (is_new, lang, t,
    n_words) — whitespace word arrays of every non-empty document with
    the batch carve-out flag."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            ((F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM).alias(
                "is_new"
            ),
            "lang",
            toks.alias("t"),
        )
        .where(F.size("t") >= 1)
        .withColumn("n_words", F.size("t"))
    )


def _bpe_train_apply(cur: DataFrame, count_pred: Column) -> DataFrame:
    """Train BPE_ROUNDS merges with pair counts restricted to rows
    satisfying ``count_pred`` and apply each winner to EVERY row — the
    pipeline9 trainer loop, shared by the drift monitor (counts over
    standing rows: the deployed tokenizer) and the retrain operator
    (counts over standing+batch).  Winner per round = (count desc,
    pair asc); greedy left-to-right fold with chr(31) glue; a round
    with no counted pairs degrades to pass-through.  The per-round
    ``first()`` is the 1-row driver argmax inherent to the iterative
    trainer (the pipeline9/dedup-fixpoint pattern)."""
    for _ in range(BPE_ROUNDS):
        pairs = (
            cur.where(count_pred)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(
                            F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))
                        ),
                        F.slice(
                            F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))
                        ),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("pr")
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        win = pairs.orderBy(F.desc("n"), "a", "b").first()
        if win is None:
            break  # counted rows out of pairs; later rounds pass through
        a, b = win["a"], win["b"]
        merged = F.aggregate(
            F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
            F.element_at(F.col("t"), 1),
            lambda acc, x: F.when(
                ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a)))
                & (x == F.lit(b)),
                F.concat(acc, F.lit("\x1f"), x),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
        cur = cur.withColumn("t", F.split(merged, " ")).localCheckpoint(
            eager=True
        )
    return cur


def _deployed_tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus under YESTERDAY'S tokenizer (merges trained on
    standing rows only, applied to everyone) — memoized via
    registry.shared_frame because BOTH tokenizer operators (the drift
    monitor and the retrain) start from it: without the memo one
    suite run pays the deployed chain's BPE_ROUNDS pair-count
    aggregations twice (the ivf_frozen_centroids precedent).  The
    extra terminal checkpoint guards the no-merge degenerate case
    where the trainer loop exits before checkpointing."""
    from go_map_reduce_spark.registry import shared_frame

    return shared_frame(
        spark,
        f"bpe_deployed:{sf_dir}",
        lambda: _bpe_train_apply(
            _doc_word_tokens(spark, sf_dir), ~F.col("is_new")
        ).localCheckpoint(eager=True),
        data_path=sf_dir,
    )


def _retrained_tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus under TODAY'S retrained tokenizer (merges trained on
    standing+batch, applied to everyone) — memoized exactly like the
    deployed chain (r10 ADVICE closure): repeated invocations within
    one session (oracle test + reconciliation test + bench) would
    otherwise pay BPE_ROUNDS full-corpus localCheckpoints and driver
    argmaxes per call.  Same trainer, different count predicate — the
    factoring that pins the two chains to identical semantics."""
    from go_map_reduce_spark.registry import shared_frame

    return shared_frame(
        spark,
        f"bpe_retrained:{sf_dir}",
        lambda: _bpe_train_apply(
            _doc_word_tokens(spark, sf_dir), F.lit(True)
        ).localCheckpoint(eager=True),
        data_path=sf_dir,
    )


def _sql_drift_round(prev: str, it: int) -> str:
    """One unrolled round: pair counts over STANDING rows only (the
    deployed tokenizer never saw the batch), the (count desc, pair
    asc) winner applied to EVERY row — degrading pass-through when a
    round finds no standing pairs (the pipeline25 LEFT JOIN shape)."""
    return f"""
    pairs{it} AS (
      SELECT t[p] AS a, t[p+1] AS b, COUNT(*) AS n
      FROM (SELECT t, unnest(range(1, len(t))) AS p
            FROM {prev} WHERE NOT is_new)
      GROUP BY t[p], t[p+1]
    ),
    win{it} AS (
      SELECT a, b FROM pairs{it} ORDER BY n DESC, a, b LIMIT 1
    ),
    c{it} AS (
      SELECT is_new, lang, n_words,
             CASE WHEN w{it}.a IS NULL THEN t
                  ELSE regexp_split_to_array({_sql_apply_merge('t', f'w{it}')}, ' ')
             END AS t
      FROM {prev} LEFT JOIN win{it} w{it} ON TRUE
    )"""


@query(
    "tokenizer_batch_drift",
    oracle=f"""
    WITH c0 AS (
      SELECT ({_IS_BATCH}) AS is_new, lang, {_SQL_TOKS} AS t,
             len({_SQL_TOKS}) AS n_words
      FROM documents WHERE len({_SQL_TOKS}) >= 1
    ),
    {','.join(_sql_drift_round(f'c{i}', i + 1) for i in range(BPE_ROUNDS))},
    f AS (
      SELECT lang, is_new,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS nw,
             CAST(SUM(len(t)) AS BIGINT) AS nt
      FROM c{BPE_ROUNDS} GROUP BY lang, is_new
    )
    SELECT s.lang,
           s.n_docs AS n_docs_standing, b.n_docs AS n_docs_batch,
           round(CAST(s.nt AS DOUBLE) / s.nw, 6) AS tpw_standing,
           round(CAST(b.nt AS DOUBLE) / b.nw, 6) AS tpw_batch,
           round(CAST(b.nt AS DOUBLE) / b.nw
                 - CAST(s.nt AS DOUBLE) / s.nw, 6) AS delta_tpw,
           CAST((s.nw - s.nt) * 1000 // s.nw AS BIGINT)
             AS merge_rate_standing_permille,
           CAST((b.nw - b.nt) * 1000 // b.nw AS BIGINT)
             AS merge_rate_batch_permille
    FROM f s JOIN f b ON b.lang = s.lang AND b.is_new AND NOT s.is_new
    """,
)
def tokenizer_batch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yesterday's tokenizer applied to today's batch: BPE merges are
    trained on the STANDING corpus only (doc_id % 10 != 7; 3 rounds,
    the pipeline9 trainer loop — pair counts on standing rows, winner
    by (count desc, pair asc)), then applied to BOTH populations, and
    the report compares them per language: document/word counts,
    fertility (tokens per word, post-merge), its batch-minus-standing
    delta, and the exact integer merge rate (permille of words
    absorbed into a merge).  The standing columns are the deployed
    baseline; a batch whose merge rate drops (or fertility rises) is
    content the deployed vocabulary doesn't cover — the retrain
    trigger, detected at ingest.

    100 TB shape: training cost is the trainer's own (one map-side-
    combinable pair-count aggregation over the STANDING corpus per
    round + a 1-row driver action — the pipeline9/dedup-fixpoint
    pattern); application is a narrow per-row fold with the winning
    pair as a literal (no join, no shuffle); the report is one
    (lang × population) aggregate.  Daily cost beyond the standing
    pair counts scales with the batch."""
    cur = _deployed_tokenized(spark, sf_dir)
    f = cur.groupBy("lang", "is_new").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("nw"),
        F.sum(F.size("t")).cast("long").alias("nt"),
    )
    s = f.where(~F.col("is_new")).select(
        "lang",
        F.col("n_docs").alias("n_docs_standing"),
        F.col("nw").alias("s_nw"),
        F.col("nt").alias("s_nt"),
    )
    b2 = f.where(F.col("is_new")).select(
        F.col("lang").alias("b_lang"),
        F.col("n_docs").alias("n_docs_batch"),
        F.col("nw").alias("b_nw"),
        F.col("nt").alias("b_nt"),
    )
    return s.join(b2, F.col("lang") == F.col("b_lang")).select(
        "lang",
        "n_docs_standing",
        "n_docs_batch",
        F.round(F.col("s_nt").cast("double") / F.col("s_nw"), 6).alias(
            "tpw_standing"
        ),
        F.round(F.col("b_nt").cast("double") / F.col("b_nw"), 6).alias(
            "tpw_batch"
        ),
        F.round(
            F.col("b_nt").cast("double") / F.col("b_nw")
            - F.col("s_nt").cast("double") / F.col("s_nw"),
            6,
        ).alias("delta_tpw"),
        F.expr("CAST(((s_nw - s_nt) * 1000) DIV s_nw AS BIGINT)").alias(
            "merge_rate_standing_permille"
        ),
        F.expr("CAST(((b_nw - b_nt) * 1000) DIV b_nw AS BIGINT)").alias(
            "merge_rate_batch_permille"
        ),
    )


# --------------------------------------------------------------------------
# Acting on the drift report: the tokenizer retrain
# --------------------------------------------------------------------------


def _sql_retrain_round(prev: str, it: int) -> str:
    """One unrolled RETRAIN round: pair counts over EVERY row (the
    retrained tokenizer sees standing+batch), winner applied to every
    row — the same degrading LEFT JOIN shape as the deployed chain,
    under rp/rw/r names so both chains coexist in one oracle."""
    return f"""
    rp{it} AS (
      SELECT t[p] AS a, t[p+1] AS b, COUNT(*) AS n
      FROM (SELECT t, unnest(range(1, len(t))) AS p FROM {prev})
      GROUP BY t[p], t[p+1]
    ),
    rw{it} AS (
      SELECT a, b FROM rp{it} ORDER BY n DESC, a, b LIMIT 1
    ),
    r{it} AS (
      SELECT is_new, lang, n_words,
             CASE WHEN rw{it}.a IS NULL THEN t
                  ELSE regexp_split_to_array({_sql_apply_merge('t', f'rw{it}')}, ' ')
             END AS t
      FROM {prev} LEFT JOIN rw{it} ON TRUE
    )"""


@query(
    "tokenizer_retrain_recovery",
    oracle=f"""
    WITH c0 AS (
      SELECT ({_IS_BATCH}) AS is_new, lang, {_SQL_TOKS} AS t,
             len({_SQL_TOKS}) AS n_words
      FROM documents WHERE len({_SQL_TOKS}) >= 1
    ),
    {','.join(_sql_drift_round(f'c{i}', i + 1) for i in range(BPE_ROUNDS))},
    {','.join(
        _sql_retrain_round('c0' if i == 0 else f'r{i}', i + 1)
        for i in range(BPE_ROUNDS))},
    fd AS (
      SELECT lang, CAST(SUM(n_words) AS BIGINT) AS nw,
             CAST(SUM(len(t)) AS BIGINT) AS nt
      FROM c{BPE_ROUNDS} WHERE is_new GROUP BY lang
    ),
    fr AS (
      SELECT lang, CAST(SUM(n_words) AS BIGINT) AS nw,
             CAST(SUM(len(t)) AS BIGINT) AS nt
      FROM r{BPE_ROUNDS} WHERE is_new GROUP BY lang
    )
    SELECT d.lang,
           round(CAST(d.nt AS DOUBLE) / d.nw, 6) AS tpw_batch_deployed,
           round(CAST(r.nt AS DOUBLE) / r.nw, 6) AS tpw_batch_retrained,
           round(CAST(d.nt AS DOUBLE) / d.nw
                 - CAST(r.nt AS DOUBLE) / r.nw, 6) AS recovery_tpw,
           CAST((d.nw - d.nt) * 1000 // d.nw AS BIGINT)
             AS merge_rate_deployed_permille,
           CAST((r.nw - r.nt) * 1000 // r.nw AS BIGINT)
             AS merge_rate_retrained_permille,
           CAST((r.nw - r.nt) * 1000 // r.nw
                - (d.nw - d.nt) * 1000 // d.nw AS BIGINT)
             AS recovery_permille
    FROM fd d JOIN fr r ON r.lang = d.lang
    """,
)
def tokenizer_retrain_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acting on ``tokenizer_batch_drift``'s alarm (the report→act
    pattern, after substring_dup_cut and ivf_index_compaction): train
    the RETRAINED tokenizer on standing+batch with the identical
    trainer loop the deployed one used on standing only, apply both to
    the day's batch, and report the recovery per language — fertility
    (tokens per word) under each tokenizer, their delta (positive =
    the retrain tokenizes the batch more compactly), and the exact
    integer merge-rate permille under each with its recovery delta.
    On an undrifted batch (an iid slice, as in the registered
    carve-out) the two tokenizers largely agree and recovery sits at
    ~0 — the report then documents that NO retrain is needed; on a
    drifted batch the deployed merge rate collapses while the
    retrained one holds, and recovery_permille is the measured value
    of shipping the retrain (alarm→remedy direction pinned on a
    constructed alien batch in tests/test_round10_retrain.py).

    100 TB shape: twice the trainer's cost (each round one map-side-
    combinable pair-count aggregation + a 1-row driver argmax — the
    pipeline9 pattern), application a per-row literal fold, report a
    (lang x 2) aggregate.  The retrain reuses the deployed trainer's
    machinery verbatim (_bpe_train_apply), so the two chains cannot
    drift in semantics, only in their counted populations.  Both
    chains are shared frames — first-consumer attribution applies:
    whichever query touches a chain first in a session pays its
    BPE_ROUNDS training cost; later consumers read checkpoint blocks."""
    dep = _deployed_tokenized(spark, sf_dir)
    ret = _retrained_tokenized(spark, sf_dir)

    def _batch_agg(df: DataFrame, p: str) -> DataFrame:
        return (
            df.where("is_new")
            .groupBy("lang")
            .agg(
                F.sum("n_words").cast("long").alias(f"{p}nw"),
                F.sum(F.size("t")).cast("long").alias(f"{p}nt"),
            )
        )

    d = _batch_agg(dep, "d_")
    r = _batch_agg(ret, "r_").withColumnRenamed("lang", "r_lang")
    return d.join(r, F.col("lang") == F.col("r_lang")).select(
        "lang",
        F.round(F.col("d_nt").cast("double") / F.col("d_nw"), 6).alias(
            "tpw_batch_deployed"
        ),
        F.round(F.col("r_nt").cast("double") / F.col("r_nw"), 6).alias(
            "tpw_batch_retrained"
        ),
        F.round(
            F.col("d_nt").cast("double") / F.col("d_nw")
            - F.col("r_nt").cast("double") / F.col("r_nw"),
            6,
        ).alias("recovery_tpw"),
        F.expr("CAST(((d_nw - d_nt) * 1000) DIV d_nw AS BIGINT)").alias(
            "merge_rate_deployed_permille"
        ),
        F.expr("CAST(((r_nw - r_nt) * 1000) DIV r_nw AS BIGINT)").alias(
            "merge_rate_retrained_permille"
        ),
        F.expr(
            "CAST(((r_nw - r_nt) * 1000) DIV r_nw"
            " - ((d_nw - d_nt) * 1000) DIV d_nw AS BIGINT)"
        ).alias("recovery_permille"),
    )
