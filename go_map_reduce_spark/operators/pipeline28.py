"""Round-8 second batch: audit + objective-prep operators.

``leakage_audit`` is the audit artifact a leakage-audited pipeline
ships NEXT TO its split: the per-(split_a, split_b) matrix of verified
near-dup pair counts, for BOTH the registered cluster-keyed split and
the naive doc-hash split a pre-audit pipeline would have used. The
cluster policy's cross-split cell reading exactly 0 — with nonzero
within-split cells proving pairs exist — is the leakage guarantee as a
queryable, driver-gateable result instead of a property test only.

``span_corruption_masks`` closes the objective-prep gap: T5-style span
corruption (Raffel et al. 2020, §3.1.4) statistics per document, with
the span selection DETERMINISTIC via the engine's md5-prefix
convention so both engines (and a rerun at any partitioning) mask the
identical positions — the property that makes a 100 TB preprocessing
job resumable and auditable.

Both follow the decision-closing pattern of rounds 6-8: operators a
training-data team runs on the CURATED corpus the capstone emits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs
from go_map_reduce_spark.operators.pipeline26 import (
    VAL_PERMILLE,
    leakage_safe_split,
    permille_draw_case,
    permille_draw_col,
)
from go_map_reduce_spark.operators.textstats import _sql_toks, _toks
from go_map_reduce_spark.registry import ORACLES, query, track_cache

# --------------------------------------------------------------------------
# Cross-split leakage audit (the shipped counterpart of the r07 property
# test on leakage_safe_split)
# --------------------------------------------------------------------------

_POLICIES = ("cluster_split", "doc_hash_split")
_CELLS = (("train", "train"), ("train", "val"), ("val", "val"))


def _naive_split_case(col: str) -> str:
    """DuckDB CASE text for the naive doc-hash split of ``col`` — the
    same permille draw leakage_safe_split applies to the GROUP key
    (the shared pipeline26 convention pair, one definition), here
    applied (wrongly, which is the point) to the raw doc id."""
    return (
        f"CASE WHEN {permille_draw_case(col)} < {VAL_PERMILLE}"
        " THEN 'val' ELSE 'train' END"
    )


def _naive_split_col(col: str) -> Column:
    u = permille_draw_col(F.col(col))
    return F.when(u < VAL_PERMILLE, "val").otherwise("train")


@query(
    "leakage_audit",
    oracle=f"""
    WITH pairs AS ({ORACLES["minhash_near_dup_pairs"]}),
    splitq AS ({ORACLES["leakage_safe_split"]}),
    labeled AS (
      SELECT 'cluster_split' AS policy,
             least(a.split, b.split) AS split_a,
             greatest(a.split, b.split) AS split_b
      FROM pairs p
      JOIN splitq a ON a.doc_id = p.doc_a
      JOIN splitq b ON b.doc_id = p.doc_b
      UNION ALL
      SELECT 'doc_hash_split',
             least({_naive_split_case('p.doc_a')},
                   {_naive_split_case('p.doc_b')}),
             greatest({_naive_split_case('p.doc_a')},
                      {_naive_split_case('p.doc_b')})
      FROM pairs p
    ),
    counts AS (
      SELECT policy, split_a, split_b, COUNT(*) AS n_pairs
      FROM labeled GROUP BY policy, split_a, split_b
    ),
    cells AS (
      SELECT pol.policy, c.split_a, c.split_b
      FROM (VALUES {", ".join(f"('{p}')" for p in _POLICIES)})
           AS pol(policy)
      CROSS JOIN (VALUES {", ".join(f"('{a}', '{b}')" for a, b in _CELLS)})
           AS c(split_a, split_b)
    )
    SELECT ce.policy, ce.split_a, ce.split_b,
           CAST(COALESCE(n.n_pairs, 0) AS BIGINT) AS n_pairs
    FROM cells ce LEFT JOIN counts n
      ON n.policy = ce.policy AND n.split_a = ce.split_a
     AND n.split_b = ce.split_b
    """,
)
def leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs per (split_a, split_b) cell — the
    normalized (least, greatest) pair of sides — under two policies:
    the registered cluster-keyed ``leakage_safe_split`` and the naive
    doc-hash split. All six cells are emitted explicitly (zero counts
    included): the audit's deliverable IS the cluster policy's
    (train, val) cell reading 0 while the same corpus's doc-hash
    policy shows the straddling mass the group key prevented.

    100 TB shape: the pair frame is verified-pair sized (already far
    below corpus size), the cluster split joins per doc_id against the
    shared cluster frame (registry.shared_frame — materialized once
    per pipeline run), the naive policy is a per-row hash needing no
    join at all, and the cell universe is a 6-row literal broadcast.
    Nothing here adds a corpus-sized shuffle beyond what the composed
    operators already pinned."""
    # both policy branches consume the pair frame and Spark shares no
    # common subplans across a union — persist the (small, verified-
    # pair-sized) frame so the LSH verify stage runs once (the
    # pipeline12.py:284 precedent; caller-owned release)
    pairs = (
        minhash_near_dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist()
        .transform(track_cache)
    )
    split = leakage_safe_split(spark, sf_dir).select("doc_id", "split")
    labeled_cluster = (
        pairs.join(
            split.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            split.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.lit("cluster_split").alias("policy"),
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    na, nb = _naive_split_col("doc_a"), _naive_split_col("doc_b")
    labeled_naive = pairs.select(
        F.lit("doc_hash_split").alias("policy"),
        F.least(na, nb).alias("split_a"),
        F.greatest(na, nb).alias("split_b"),
    )
    counts = (
        labeled_cluster.unionByName(labeled_naive)
        .groupBy("policy", "split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = spark.createDataFrame(
        [(p, a, b) for p in _POLICIES for a, b in _CELLS],
        "policy string, split_a string, split_b string",
    )
    return cells.join(counts, ["policy", "split_a", "split_b"], "left").select(
        "policy",
        "split_a",
        "split_b",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# T5-style span corruption statistics (deterministic objective prep)
# --------------------------------------------------------------------------

SPAN_START_PERMILLE = 50  # ~5% of positions start a span
SPAN_LEN = 3  # T5's mean noise span length, here a fixed span


@query(
    "span_corruption_masks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_sql_toks('text')} AS t FROM documents
    ),
    base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
    pos AS (
      SELECT doc_id, unnest(range(1, CAST(n_tokens AS INT) + 1)) AS i
      FROM base WHERE n_tokens > 0
    ),
    st AS (
      SELECT doc_id, i,
             ({permille_draw_case(
                 "CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)"
             )} < {SPAN_START_PERMILLE}) AS s
      FROM pos
    ),
    mk AS (
      SELECT doc_id, i,
             (s{"".join(f" OR COALESCE(lag(s, {k}) OVER w, FALSE)" for k in range(1, SPAN_LEN))}) AS m
      FROM st WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    sp AS (
      SELECT doc_id, m,
             (m AND NOT COALESCE(
                lag(m) OVER (PARTITION BY doc_id ORDER BY i), FALSE)) AS ss
      FROM mk
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
             CAST(SUM(CASE WHEN ss THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
      FROM sp GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           COALESCE(a.n_masked, 0) AS n_masked,
           COALESCE(a.n_spans, 0) AS n_spans,
           b.n_tokens - COALESCE(a.n_masked, 0) + COALESCE(a.n_spans, 0)
             AS input_len,
           COALESCE(a.n_masked, 0) + COALESCE(a.n_spans, 0) AS target_len,
           CASE WHEN b.n_tokens > 0
                THEN CAST(ROUND(COALESCE(a.n_masked, 0) / b.n_tokens, 6)
                          AS DOUBLE)
                ELSE 0.0 END AS corruption_rate
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    """,
)
def span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption statistics per document:
    a position i (1-based, whitespace tokens) STARTS a noise span iff
    md5(doc_id:i)'s 16-bit prefix mod 1000 < {SPAN_START_PERMILLE};
    each span covers {SPAN_LEN} consecutive positions and overlapping
    spans merge. Emitted per doc: n_masked (positions under any span),
    n_spans (merged spans — each is replaced by ONE sentinel in the
    corrupted input), input_len = n_tokens - n_masked + n_spans,
    target_len = n_masked + n_spans (sentinel + original tokens per
    span), corruption_rate = n_masked / n_tokens. Determinism by the
    md5 convention means every engine, rerun, and partitioning masks
    the IDENTICAL positions — what makes a multi-day 100 TB
    preprocessing job resumable mid-corpus and its train/inspection
    artifacts reproducible.

    100 TB shape: ZERO shuffles — the whole computation is one narrow
    projection over the scan (plan-pinned: no Exchange anywhere). The
    mask, merge, and span-count logic runs in the ARRAY DOMAIN via
    higher-order transforms on a per-row boolean vector (bounded by
    doc length), never exploding to a token-level row set: a 1e12-token
    corpus stays doc-count rows end to end. The DuckDB oracle replays
    the same decisions via unnest + window lag — different physical
    strategy, bit-identical decisions, which is exactly the
    cross-engine guarantee the md5 convention exists to give."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_toks(F.col("text"))).cast("long").alias("n_tokens")
    )
    starts = F.when(
        F.col("n_tokens") > 0,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens").cast("int")),
            lambda i: permille_draw_col(
                F.concat_ws(":", F.col("doc_id"), i)
            )
            < SPAN_START_PERMILLE,
        ),
    ).otherwise(F.array().cast("array<boolean>"))
    s1 = docs.select("doc_id", "n_tokens", starts.alias("starts"))
    prev = lambda col, i, k: F.when(  # noqa: E731
        i >= k, F.get(F.col(col), i - k)
    ).otherwise(F.lit(False))
    masked = F.transform(
        F.col("starts"),
        lambda x, i: reduce(
            lambda acc, k: acc | prev("starts", i, k),
            range(1, SPAN_LEN),
            x,
        ),
    )
    s2 = s1.select("doc_id", "n_tokens", masked.alias("masked"))
    span_start = F.transform(
        F.col("masked"), lambda x, i: x & ~prev("masked", i, 1)
    )
    s3 = s2.select(
        "doc_id",
        "n_tokens",
        F.size(F.filter("masked", lambda x: x)).cast("long").alias("n_masked"),
        F.size(F.filter(span_start, lambda x: x)).cast("long").alias(
            "n_spans"
        ),
    )
    return s3.select(
        "doc_id",
        "n_tokens",
        "n_masked",
        "n_spans",
        (F.col("n_tokens") - F.col("n_masked") + F.col("n_spans")).alias(
            "input_len"
        ),
        (F.col("n_masked") + F.col("n_spans")).alias("target_len"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_masked") / F.col("n_tokens"), 6),
        )
        .otherwise(0.0)
        .cast("double")
        .alias("corruption_rate"),
    )
