"""Round-7 pipeline operators: the substring-dedup CUT and the
corpus-scale BPE tokenize pass.

Both close "metric without its operator" gaps named by the r06 verdict:

- ``substring_dup_cut`` is the production counterpart of the
  ``cross_doc_repeated_spans`` diagnostic (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better", §4):
  where the diagnostic MEASURES how much of each document is made of
  cross-document repeated spans, this operator REMOVES them — every
  non-canonical occurrence of a duplicated K-token window is cut and
  the cleaned text re-emitted, keeping one deterministic canonical
  copy corpus-wide.
- ``bpe_corpus_tokenize`` consumes the trained artifact of
  ``bpe_merge_training`` (operators/pipeline9.py): the learned merge
  table is applied to the FULL corpus — entirely in the column domain,
  the merge rules flowing as data through a nested fold, no driver
  pull — and reported in the shape of ``tokenizer_fertility_by_lang``
  (operators/pipeline22.py).

The reference has no analytics tier at all (mr/worker.go:15-165
schedules opaque map/reduce fns); both operators are beyond-reference
training-data-pipeline surface, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.pipeline9 import (
    _SQL_TOKS,
    _sql_apply_merge,
    BPE_ROUNDS,
    bpe_merge_training,
)
from go_map_reduce_spark.operators.pipeline22 import _DSIR_SQL_TOKS, SPAN_K
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Substring-dup CUT (the production counterpart of the diagnostic)
# --------------------------------------------------------------------------

_CUT_WINS_SQL = f"""
    toks AS (
      SELECT doc_id, {_DSIR_SQL_TOKS} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, CAST(i + 1 AS INT) AS pos,
             CAST(concat('0x', substr(
               md5(array_to_string(t[i+1:i+{SPAN_K}], ' ')), 1, 15))
               AS BIGINT) AS wkey
      FROM toks, unnest(range(len(t) - {SPAN_K - 1})) AS u(i)
      WHERE len(t) >= {SPAN_K}
    )
"""


@query(
    "substring_dup_cut",
    oracle=f"""
    WITH {_CUT_WINS_SQL},
    stats AS (
      SELECT wkey, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY wkey
    ),
    ranked AS (
      SELECT w.doc_id, w.pos,
             row_number() OVER (
               PARTITION BY w.wkey
               ORDER BY md5(CAST(w.doc_id AS VARCHAR) || ':'
                            || CAST(w.pos AS VARCHAR)), w.doc_id, w.pos
             ) AS rk
      FROM wins w JOIN stats s ON w.wkey = s.wkey
      WHERE s.nd >= 2
    ),
    covered AS (
      SELECT DISTINCT doc_id, CAST(u.rp AS INT) AS rp
      FROM ranked, unnest(range(pos, pos + {SPAN_K})) AS u(rp)
      WHERE rk > 1
    ),
    positions AS (
      SELECT doc_id, CAST(p AS INT) AS p, t[p] AS w
      FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks)
    ),
    kept AS (
      SELECT pp.doc_id, pp.p, pp.w
      FROM positions pp
      LEFT JOIN covered c ON pp.doc_id = c.doc_id AND pp.p = c.rp
      WHERE c.rp IS NULL
    )
    SELECT tk.doc_id,
           CAST(len(tk.t) AS BIGINT) AS n_tokens,
           CAST(len(tk.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(k.cleaned, '') AS cleaned_text
    FROM toks tk
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(w, ' ' ORDER BY p) AS cleaned
      FROM kept GROUP BY doc_id
    ) k ON tk.doc_id = k.doc_id
    """,
)
def substring_dup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup CUT (Lee et al. 2022 §4): remove from each
    document every token covered by a non-canonical occurrence of a
    cross-document duplicated {SPAN_K}-token window, and emit the
    cleaned text. For every window text occurring in >= 2 distinct
    documents, ONE occurrence corpus-wide is the canonical keeper —
    chosen deterministically by md5(doc_id:pos) rank (tie-broken by
    doc_id, pos) so the winner is stable across engines, partitionings
    and reruns — and every other occurrence's {SPAN_K} token positions
    are cut. Overlapping cut windows union their positions; a canonical
    occurrence survives unless an overlapping duplicated window's cut
    removes part of it (over-removal, never under-removal — the safe
    direction for training-data hygiene). Re-measuring the
    cross_doc_repeated_spans diagnostic on the cleaned corpus drives
    its cross-document dup_frac to ~zero (pinned by the composed
    property test in tests/test_round7_pipeline25.py).

    100 TB shape, stage by stage: window extraction is a per-row
    generate that immediately folds the window text into a FIXED-WIDTH
    60-bit key (md5-prefix-as-int64, the engine's cross-engine hash
    convention — dedup.py:90, pipeline2.py:189) so no exchange carries
    variable-length window text at all — an 8-byte shuffle key where a
    {SPAN_K}-token text would be ~100 bytes; the spread count AND the
    canonical winner come from ONE map-side-combinable aggregation on
    that key — min(struct(md5-rank, doc_id, pos)) instead of a
    row_number sort, so a boilerplate span occurring 10M times costs a
    combiner merge, not a 10M-row partition sort; the cut set is an
    equality join of wins against the (much smaller, nd >= 2 only)
    stats frame; reassembly collects each doc's cut POSITIONS (bounded
    by doc length) and filters the token array with higher-order
    functions — the document text never shuffles at all after the
    scan. A 60-bit key collision merges two window groups and can only
    ADD cut positions (over-removal — the safe direction); both
    engines key identically, so the differential stays exact. No
    all-pairs comparison anywhere."""
    # r15: memoized via registry.shared_frame — three call sites compose
    # on the cut (the staged decision frame, the bucketed layout, this
    # query itself) and each used to re-run the whole window-extraction
    # pipeline; at 100 TB the cleaned corpus materializes once.  Build
    # billed to the first consumer (memo-aware bench reps).  The
    # un-memoized plan stays exposed as _cut_plan so the scale-guard
    # plan pins (tests/test_round7_pipeline25.py) keep asserting the
    # BUILD's exchanges, not the memo's block scan.
    from go_map_reduce_spark.registry import shared_frame

    return shared_frame(
        spark,
        f"substring_cut:{sf_dir}",
        lambda: _cut_plan(spark, sf_dir).localCheckpoint(eager=True),
        data_path=sf_dir,
    )


def _cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw (un-memoized) substring-cut plan — see substring_dup_cut."""
    from go_map_reduce_spark.registry import track_cache

    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("t")
    )
    # wins feeds BOTH the stats aggregate and the cut join — Spark
    # shares no subplans across joins, so without the persist the
    # corpus-wide window extraction (explode + 2 md5s per window)
    # runs twice per build (r15, guide §2.4 multi-consumer persist).
    wins = (
        docs.where(F.size("t") >= SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(t) - {SPAN_K}),"
                    f" i -> array_join(slice(t, i + 1, {SPAN_K}), ' '))"
                )
            ).alias("pos0", "win"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.conv(F.substring(F.md5("win"), 1, 15), 16, 10)
            .cast("long")
            .alias("wkey"),
            F.md5(
                F.concat_ws(":", F.col("doc_id"), F.col("pos0") + 1)
            ).alias("rk"),
        )
        .persist()
        .transform(track_cache)
    )
    # one aggregation yields both the doc-spread and the canonical
    # occurrence per window key (partial-aggregatable, unlike a
    # row_number over the window partition)
    stats = wins.groupBy("wkey").agg(
        F.count_distinct("doc_id").alias("nd"),
        F.min(F.struct("rk", "doc_id", "pos")).alias("c"),
    )
    cut = (
        wins.join(stats.where(F.col("nd") >= 2), "wkey")
        .where(
            ~(
                (F.col("doc_id") == F.col("c.doc_id"))
                & (F.col("pos") == F.col("c.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    cov = (
        cut.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_K - 1))
            ).alias("rp"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("rp").alias("cut_pos"))
    )
    kept = F.expr(
        """
        filter(transform(t, (w, i) -> named_struct('p', i + 1, 'w', w)),
               s -> NOT array_contains(cut_pos, s.p))
        """
    )
    return (
        docs.join(cov, "doc_id", "left")
        .withColumn(
            "cut_pos", F.coalesce("cut_pos", F.array().cast("array<int>"))
        )
        .withColumn("kept", kept)
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            (F.size("t") - F.size("kept")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform("kept", lambda s: s["w"]), " "
            ).alias("cleaned_text"),
        )
    )


# --------------------------------------------------------------------------
# BPE corpus tokenize (apply the trained merges at corpus scale)
# --------------------------------------------------------------------------


def _sql_fertility_round(prev: str, it: int) -> str:
    """One unrolled apply round mirroring pipeline9._sql_round, but
    carrying (lang, n_words) through the re-tokenization so the final
    corpus can be reported per language — and degrading like the Spark
    side when a round finds no pairs: the trainer's CROSS JOIN shape
    would EMPTY the corpus when win{it} is empty, whereas the Spark
    loop just stops merging, so here the (at most 1-row) winner joins
    with LEFT JOIN ON TRUE and an exhausted round passes tokens
    through unchanged."""
    return f"""
    pairs{it} AS (
      SELECT t[p] AS a, t[p+1] AS b, COUNT(*) AS n
      FROM (SELECT t, unnest(range(1, len(t))) AS p FROM {prev})
      GROUP BY t[p], t[p+1]
    ),
    win{it} AS (
      SELECT a, b FROM pairs{it} ORDER BY n DESC, a, b LIMIT 1
    ),
    c{it} AS (
      SELECT lang, n_words,
             CASE WHEN w{it}.a IS NULL THEN t
                  ELSE regexp_split_to_array({_sql_apply_merge('t', f'w{it}')}, ' ')
             END AS t
      FROM {prev} LEFT JOIN win{it} w{it} ON TRUE
    )"""


@query(
    "bpe_corpus_tokenize",
    oracle=f"""
    WITH c0 AS (
      SELECT lang, {_SQL_TOKS} AS t, len({_SQL_TOKS}) AS n_words
      FROM documents WHERE len({_SQL_TOKS}) >= 1
    ),
    {','.join(_sql_fertility_round(f'c{i}', i + 1) for i in range(BPE_ROUNDS))}
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
           round(CAST(SUM(len(t)) AS DOUBLE) / SUM(n_words), 6)
             AS tokens_per_word
    FROM c{BPE_ROUNDS}
    GROUP BY lang
    """,
)
def bpe_corpus_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale application of the TRAINED BPE merge table: the
    merge rules learned by bpe_merge_training (pipeline9) are applied
    to every document, and the resulting tokenization is reported per
    language in the tokenizer_fertility_by_lang shape (n_docs, word
    and token totals, tokens-per-word) — the pass a real pipeline runs
    after training a tokenizer, answering "what does the learned vocab
    cost per language on the full corpus".

    The trained artifact is consumed WITHOUT any driver-side pull: the
    merge table (an at-most-{BPE_ROUNDS}-row frame) is folded into a
    single array column, broadcast onto the corpus, and applied with a
    NESTED fold — the outer `aggregate` walks the merge rules in
    training order, the inner `aggregate` is the greedy left-to-right
    merge fold of pipeline9 (the one that gets 'a a a a' right), with
    the rule's (a, b) flowing in as DATA from the outer lambda rather
    than as literals. Merged tokens glue with chr(31), matching the
    trainer, so a fresh merge can't immediately re-merge.

    100 TB shape: training cost is the trainer's (one pair-count
    aggregation per round); the apply is ONE narrow map pass over the
    corpus — no shuffle, no join except the broadcast of a
    constant-size merge frame — followed by a per-lang aggregate.
    This is exactly how a distributed tokenizer deployment works:
    model artifact broadcast, map-apply, reduce-report."""
    merges = bpe_merge_training(spark, sf_dir).agg(
        F.array_sort(
            F.collect_list(F.struct("round", "pair"))
        ).alias("merges")
    )
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("lang", toks.alias("t"))
        .where(F.size("t") >= 1)
        .withColumn("n_words", F.size("t"))
    )
    applied = docs.crossJoin(F.broadcast(merges)).withColumn(
        "t",
        F.expr(
            """
            aggregate(
              merges, t,
              (tacc, m) -> split(
                aggregate(
                  slice(tacc, 2, greatest(size(tacc) - 1, 0)),
                  element_at(tacc, 1),
                  (acc, x) -> CASE
                    WHEN (acc = element_at(split(m.pair, ' '), 1)
                          OR endswith(acc,
                               ' ' || element_at(split(m.pair, ' '), 1)))
                         AND x = element_at(split(m.pair, ' '), 2)
                    THEN acc || chr(31) || x
                    ELSE acc || ' ' || x END),
                ' '))
            """
        ),
    )
    return applied.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words")).cast("long").alias("n_words"),
        F.sum(F.size("t")).cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.size("t")).cast("double") / F.sum(F.col("n_words")), 6
        ).alias("tokens_per_word"),
    )
