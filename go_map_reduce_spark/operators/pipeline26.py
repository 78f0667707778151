"""Round-7 pipeline operators, second batch: decision-closing
compositions.

Each of these converts a registered REPORT into the operator that acts
on its finding — the same metric→operator completion pattern as
``substring_dup_cut``:

- ``sequence_packing_bestfit``: `packing_efficiency_report` measures
  how many documents the concat-and-chunk packer SPLITS across
  sequence boundaries and names best-fit packing as the remedy; this
  is that remedy — non-splitting next-fit-decreasing packing, shard-
  local, with an exact recursive-CTE oracle.
- ``dedup_keep_best_quality``: the dedup cluster tier keeps one doc
  per near-dup cluster; production keeps the BEST copy, not the
  smallest doc_id. Composes the large-star clusters with the quality
  tier and picks each cluster's keeper by content mass.
- ``lang_confusion_matrix``: `language_id` predicts per document; the
  curator consumes the label-vs-prediction CONFUSION MATRIX (which
  declared languages the n-gram model confuses, and how often) to
  decide marker-set repairs before trusting lang-conditioned sampling.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import (
    Column,
    DataFrame,
    SparkSession,
    Window as W,
    functions as F,
)

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.advanced import dedup_clusters_largestar
from go_map_reduce_spark.operators.textstats import (
    PACK_BUDGET,
    PACK_SHARD,
    _sql_toks,
    _toks,
    language_id,
    text_quality_scores,
)
from go_map_reduce_spark.registry import ORACLES, query

# --------------------------------------------------------------------------
# Best-fit (next-fit-decreasing) sequence packing — the non-splitting packer
# --------------------------------------------------------------------------

def _pack_oracle_from(src: str, keys: tuple[str, ...] = ("shard",)) -> str:
    """Recursive-CTE next-fit-decreasing packing over any source
    relation with (doc_id, n_tokens, *keys) — `ordered` + `packed`
    CTE bodies, parameterized by the partition key list so the
    registered packer (keys=shard) and the capstone's per-split pack
    (keys=split, shard) replay the IDENTICAL fold. The recursion steps
    one rank per iteration with every partition advancing in lockstep,
    bounded by the largest partition's row count."""
    k = ", ".join(keys)
    ok = ", ".join(f"o.{x}" for x in keys)
    cond = " AND ".join(f"o.{x} = p.{x}" for x in keys)
    return f"""
    ordered AS (
      SELECT *, row_number() OVER (
               PARTITION BY {k} ORDER BY n_tokens DESC, doc_id
             ) AS rn
      FROM {src}
    ),
    packed AS (
      SELECT {k}, rn, doc_id, n_tokens,
             n_tokens AS fill, CAST(0 AS BIGINT) AS bin
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT {ok}, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.fill + o.n_tokens <= {PACK_BUDGET}
                  THEN p.fill + o.n_tokens ELSE o.n_tokens END,
             CASE WHEN p.fill + o.n_tokens <= {PACK_BUDGET}
                  THEN p.bin ELSE p.bin + 1 END
      FROM packed p JOIN ordered o
        ON {cond} AND o.rn = p.rn + 1
    )"""


def _shard_col():
    """Exact int64 shard key: Spark's ``DIV`` truncates toward zero in
    integer arithmetic, precisely matching DuckDB's integer ``//``
    (verified: -7//2 = -3 in both) for ANY doc_id — no double-precision
    round-trip, so ids beyond 2^53 shard identically in both engines."""
    return F.expr(f"doc_id DIV {PACK_SHARD}").alias("shard")


def _nfd_pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential next-fit-decreasing fold over ONE shard group
    (module-level so the capstone's per-split pack reuses the exact
    fold the registered packer runs)."""
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    fill = PACK_BUDGET + 1  # forces the first doc to open bin 0
    bin_no = -1
    bins, offs = [], []
    for n in pdf["n_tokens"]:
        if fill + n <= PACK_BUDGET:
            offs.append(fill)
            fill += n
        else:
            bin_no += 1
            offs.append(0)
            fill = n
        bins.append(bin_no)
    out = pdf[["doc_id", "n_tokens", "shard"]].copy()
    out["seq_id"] = out["shard"] * 1_000_000 + pd.Series(bins)
    out["off_in_seq"] = pd.Series(offs)
    return out


@query(
    "sequence_packing_bestfit",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, CAST(len({_sql_toks('text')}) AS BIGINT) AS n_tokens,
             doc_id // {PACK_SHARD} AS shard
      FROM documents
    ),
    {_pack_oracle_from('toks')}
    SELECT doc_id, n_tokens, shard,
           CAST(shard * 1000000 + bin AS BIGINT) AS seq_id,
           CAST(fill - n_tokens AS BIGINT) AS off_in_seq
    FROM packed
    """,
)
def sequence_packing_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-splitting sequence packing (next-fit-decreasing): within
    each {PACK_SHARD}-doc shard, documents sort by (n_tokens DESC,
    doc_id) and fill {PACK_BUDGET}-token sequences greedily — a doc
    that doesn't fit the open sequence CLOSES it and opens the next,
    so no document ever straddles a training-sequence boundary
    (split_frac == 0 by construction — the exact remedy
    packing_efficiency_report exists to recommend; decreasing order is
    what keeps the tail bins dense). A document longer than the budget
    gets a sequence of its own (off_in_seq 0) and is the training
    loader's truncation case, surfaced rather than hidden.

    Engine shapes: packing is inherently sequential PER SHARD, so the
    Spark side runs it as an Arrow-batched applyInPandas over shard
    groups ({PACK_SHARD} rows each — thousands of independent groups
    at 100 TB, exactly how a cluster packs shards in parallel), while
    the DuckDB oracle replays the identical fold as a recursive CTE
    stepping one rank per iteration (bounded by {PACK_SHARD}
    iterations, all shards advancing in lockstep). Integer-only state,
    deterministic order: bit-identical outputs.

    100 TB: one shuffle on the shard key, bounded per-group state,
    output ids namespaced shard*1e6+bin like the chunk packer — the
    two packers are drop-in interchangeable downstream."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sized = docs.select(
        "doc_id",
        F.size(_toks(F.col("text"))).cast("long").alias("n_tokens"),
        _shard_col(),
    )
    return sized.groupBy("shard").applyInPandas(
        _nfd_pack,
        schema=(
            "doc_id long, n_tokens long, shard long, "
            "seq_id long, off_in_seq long"
        ),
    )


# --------------------------------------------------------------------------
# Keep-best-quality dedup survivors
# --------------------------------------------------------------------------


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH clusters AS ({ORACLES["dedup_clusters_largestar"]}),
    quality AS ({ORACLES["text_quality_scores"]}),
    scored AS (
      -- LEFT join + 0 default: the quality tier filters out zero-token
      -- docs, but whitespace-only docs DO cluster (the shingle builder
      -- maps them all to the "" shingle), and dropping them here would
      -- silently keep every duplicate empty doc downstream
      SELECT c.doc_id, c.cluster_id,
             CAST(COALESCE(q.n_tokens, 0) AS BIGINT) AS n_tokens
      FROM clusters c LEFT JOIN quality q ON q.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT doc_id, cluster_id, n_tokens,
             row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY n_tokens DESC, doc_id
             ) AS rk,
             first_value(doc_id) OVER (
               PARTITION BY cluster_id
               ORDER BY n_tokens DESC, doc_id
             ) AS kept_doc_id
      FROM scored
    )
    SELECT doc_id, cluster_id, n_tokens,
           (rk = 1) AS is_kept, kept_doc_id
    FROM ranked
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection: for each near-dup cluster
    (large-star connected components), keep the copy with the MOST
    CONTENT (n_tokens from the quality tier, doc_id tiebreak) instead
    of an arbitrary min-id — what a production dedup actually ships,
    since near-dup copies differ by truncation/boilerplate and the
    longest copy dominates the rest. One row per clustered doc with
    its verdict and its cluster's keeper, so the downstream cut is a
    semi-join on is_kept.

    100 TB shape: composes the O(log n) cluster operator (its own
    keyed shuffles) with the per-row quality scan, then ONE window
    over cluster_id — clusters are near-dup groups, orders of
    magnitude smaller than the corpus; the window partition is
    bounded by the largest near-dup cluster (over-cap boilerplate
    never reaches clustering — it routes to template handling
    upstream)."""
    clusters = dedup_clusters_largestar(spark, sf_dir)
    quality = text_quality_scores(spark, sf_dir).select("doc_id", "n_tokens")
    # LEFT join + 0 default: quality filters out zero-token docs, but
    # whitespace-only docs DO cluster (they all share the "" shingle);
    # an inner join would drop those clusters entirely and a downstream
    # cut on is_kept would keep every duplicate empty doc
    joined = clusters.join(quality, "doc_id", "left").withColumn(
        "n_tokens", F.coalesce("n_tokens", F.lit(0)).cast("long")
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_tokens"), "doc_id")
    return joined.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("is_kept"),
        F.first("doc_id").over(w).alias("kept_doc_id"),
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix
# --------------------------------------------------------------------------


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH preds AS ({ORACLES["language_id"]}),
    cells AS (
      SELECT labeled_lang, predicted_lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM preds GROUP BY labeled_lang, predicted_lang
    )
    SELECT labeled_lang, predicted_lang, n_docs,
           round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (
             PARTITION BY labeled_lang), 6) AS row_frac
    FROM cells
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-prediction confusion matrix over the n-gram language
    identifier: per (declared lang, predicted lang) cell, document
    count and row-normalized fraction. The curator's acceptance test
    for lang-conditioned operations (DSIR target slices, domain-mix
    sampling, per-lang fertility): off-diagonal mass names exactly
    which declared languages the marker model confuses — and the
    corpus's non-marker languages (fr, zh) SHOULD show as spread rows,
    which is the honest reading, not a defect.

    100 TB shape: composes the per-row predictor, one cell-count
    aggregation (map-side combinable, cells bounded by langs²), and a
    window over the constant-size cell frame. Nothing data-sized
    shuffles twice."""
    preds = language_id(spark, sf_dir)
    cells = preds.groupBy(
        F.col("labeled_lang"), F.col("predicted_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = W.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("row_frac"),
    )


# --------------------------------------------------------------------------
# Leakage-safe train/validation split (split by near-dup cluster)
# --------------------------------------------------------------------------

VAL_PERMILLE = 100  # ~10% validation, decided on the group key


def permille_draw_col(col: Column) -> Column:
    """The engine's cross-engine uniform draw as a Spark Column: the
    16-bit md5 prefix of ``col``'s string form, mod 1000 — a value in
    [0, 1000) that is bit-identical to ``permille_draw_case`` on the
    DuckDB side. Every permille-threshold decision (this split, the
    leakage audit's naive contrast, span-corruption starts) MUST go
    through this pair so the convention has exactly one definition."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        % 1000
    )


def permille_draw_case(expr: str) -> str:
    """DuckDB SQL text of the same draw over ``expr`` (any type —
    cast to VARCHAR to match Spark's string form)."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 4))"
        " AS BIGINT) % 1000"
    )


@query(
    "leakage_safe_split",
    oracle=f"""
    WITH clusters AS ({ORACLES["dedup_clusters_largestar"]}),
    grouped AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id,
             (c.cluster_id IS NOT NULL) AS in_dup_cluster
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, group_id, in_dup_cluster,
           CASE WHEN {permille_draw_case('group_id')} < {VAL_PERMILLE}
                THEN 'val' ELSE 'train' END AS split
    FROM grouped
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates across
    the boundary: the split unit is the near-dup CLUSTER (large-star
    connected components; unclustered docs are their own unit), and
    the train/val decision hashes the GROUP key, so two documents that
    are verified near-dups always land on the same side. Splitting by
    raw doc hash — what naive pipelines do — puts ~2·frac·(1-frac) of
    every near-dup pair's mass astride the boundary, silently
    inflating validation scores with memorized duplicates; this is the
    split a leakage-audited pipeline actually ships. ~{VAL_PERMILLE}/1000
    of GROUPS go to validation via the engine's md5-prefix uniform
    convention (bit-identical across engines and partitionings;
    deterministic_sample_orders applies the same md5-prefix idea with a
    raw 16-bit threshold where this operator takes the prefix mod 1000
    — permille granularity reads directly as a fraction).

    100 TB shape: one left join of the corpus against the (much
    smaller) cluster assignment, then a per-row hash — no new
    data-sized shuffle beyond the cluster operator's own; the split
    column is computable at scan time forever after, so downstream
    readers filter train/val with a pushed-down predicate.

    The property test joins the registered verified-pair frame back
    against this split and pins straddling pairs = 0."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = dedup_clusters_largestar(spark, sf_dir)
    grouped = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
        F.col("cluster_id").isNotNull().alias("in_dup_cluster"),
    )
    u = permille_draw_col(F.col("group_id"))
    return grouped.select(
        "doc_id",
        "group_id",
        "in_dup_cluster",
        F.when(u < VAL_PERMILLE, "val").otherwise("train").alias("split"),
    )
