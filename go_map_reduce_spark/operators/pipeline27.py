"""Round-8 capstone: the end-to-end curation pipeline funnel.

``curation_pipeline_e2e`` composes the now-complete curation stages —
quality gate → substring cut → near-dup keep-best → leakage-safe
train/val split → best-fit sequence packing — into the ONE artifact a
training-data team actually ships: the per-split funnel (docs in, docs
dropped per stage, tokens cut, tokens kept, packed sequences). It is
the same metric→operator completion pattern that drove rounds 6–7, one
level up: the stages exist and are individually gated; this proves
they COMPOSE.

Reference anchor: this is the end-to-end shape main/test-mr.sh:64-101
tests for the reference (the whole pipeline run against an oracle, not
stage-by-stage), at curation scale instead of wc scale.

Composition semantics — decision composition on the canonical corpus:
every stage's REGISTERED operator runs verbatim (direct imports, so
the staleness closure sees the edges) and contributes its per-doc
decision; a document ships iff it passes EVERY stage's decision, and
the funnel attributes each drop to the FIRST failing stage in pipeline
order (gate, then dedup). Cut and cluster decisions are computed
corpus-wide, not on gate survivors — deliberately: the canonical
keeper of a duplicated span and the near-dup cluster structure are
properties of the corpus (a span's canonical copy may sit in a
gate-dropped doc; detecting near-dup structure BEFORE cutting is what
keeps the cluster signal intact), and it is exactly what makes the
capstone equal the composition of its registered stages — each one
reusable, each one already driver-green. Packing then runs on the
final kept set only, per (split, shard), over POST-CUT token counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.operators.pipeline23 import (
    doc_quality_composite_gate,
)
from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut
from go_map_reduce_spark.operators.pipeline26 import (
    _nfd_pack,
    _pack_oracle_from,
    _shard_col,
    dedup_keep_best_quality,
    leakage_safe_split,
)
from go_map_reduce_spark.operators.pipeline33 import (
    AUD_TAGGED_CTES,
    CC_TAGGED_CTES,
)
from go_map_reduce_spark.operators.pipeline35 import (
    MEDIA_SV_CTES,
    _carrier,
    media_ok_sql,
    media_survivor_ids,
)
from go_map_reduce_spark.operators.textstats import PACK_SHARD
from go_map_reduce_spark.registry import ORACLES, query


def _pack_with_split(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-(split, shard) wrapper around the registered NFD fold."""
    out = _nfd_pack(pdf[["doc_id", "n_tokens", "shard"]])
    out["split"] = pdf["split"].iloc[0]
    return out


# The staged CTE body shared between the capstone oracle and the
# dataset-card oracle (pipeline29) — one definition of the per-doc
# decision frame, exactly like the Spark side's staged_decisions().
# media_ok (r12) replays the pipeline35 carrier-survivor election from
# the pipeline33 closed forms — the media stage's one SQL definition.
STAGED_ORACLE = f"""
      WITH gate AS ({ORACLES["doc_quality_composite_gate"]}),
      cutq AS ({ORACLES["substring_dup_cut"]}),
      keepq AS ({ORACLES["dedup_keep_best_quality"]}),
      splitq AS ({ORACLES["leakage_safe_split"]}),
      {CC_TAGGED_CTES},
      {AUD_TAGGED_CTES},
      {MEDIA_SV_CTES}
      SELECT s.doc_id, s.split,
             (g.verdict = 'keep') AS gate_ok,
             COALESCE(k.is_kept, TRUE) AS dedup_ok,
             {media_ok_sql('s')} AS media_ok,
             c.n_tokens, c.n_removed
      FROM splitq s
      JOIN gate g ON g.doc_id = s.doc_id
      JOIN cutq c ON c.doc_id = s.doc_id
      LEFT JOIN keepq k ON k.doc_id = s.doc_id
      LEFT JOIN msv sv ON sv.sdoc = s.doc_id
"""


def staged_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone's per-doc decision frame — every registered stage
    operator run verbatim and joined on doc_id: (doc_id, split,
    gate_ok, dedup_ok, media_ok, n_tokens, n_removed). Shared by the funnel,
    the dataset card, the drift report, and the incremental admit so
    'what the pipeline decided' has exactly one definition — and
    materialized ONCE per context via registry.shared_frame (the
    cluster-frame convention): the frame is narrow per-doc verdicts,
    but its lineage contains the substring cut's window machinery and
    the gate's text scan, which every consumer would otherwise
    re-run.  The disk analogue of this memo is write_staged_bucketed
    (pipeline30), which additionally co-buckets the stage frames so
    recomposition is exchange-free."""
    from go_map_reduce_spark.registry import shared_frame

    return shared_frame(
        spark,
        f"staged:{sf_dir}",
        lambda: _staged_plan(spark, sf_dir).localCheckpoint(eager=True),
        data_path=sf_dir,
    )


def _staged_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    gate = doc_quality_composite_gate(spark, sf_dir).select(
        "doc_id", "verdict"
    )
    cut = substring_dup_cut(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_removed"
    )
    keep = dedup_keep_best_quality(spark, sf_dir).select("doc_id", "is_kept")
    split = leakage_safe_split(spark, sf_dir).select("doc_id", "split")
    # The media stage rides a BROADCAST of the tiny survivor set (≤
    # #carrier-clusters rows) — unlike the four corpus-sized stage
    # frames it adds no doc_id Exchange even on the direct path.
    sv = media_survivor_ids(spark, sf_dir).withColumn("is_sv", F.lit(True))
    return (
        split.join(gate, "doc_id")
        .join(cut, "doc_id")
        .join(keep, "doc_id", "left")
        .join(F.broadcast(sv), "doc_id", "left")
        .select(
            "doc_id",
            "split",
            (F.col("verdict") == "keep").alias("gate_ok"),
            F.coalesce("is_kept", F.lit(True)).alias("dedup_ok"),
            (
                ~_carrier(F.col("doc_id"))
                | F.coalesce("is_sv", F.lit(False))
            ).alias("media_ok"),
            "n_tokens",
            "n_removed",
        )
    )


# The whole-corpus funnel oracle, shared verbatim by the direct
# capstone (below) and its bucketed-layout twin
# (pipeline30.curation_funnel_bucketed): one SQL definition of the
# funnel, exactly as funnel_from_staged is its one Spark definition.
E2E_FUNNEL_ORACLE = f"""
    WITH staged AS ({STAGED_ORACLE}),
    packed_all AS (
      WITH RECURSIVE final_sized AS (
        SELECT doc_id, n_tokens - n_removed AS n_tokens,
               doc_id // {PACK_SHARD} AS shard, split
        FROM staged WHERE gate_ok AND dedup_ok AND media_ok
      ),
      {_pack_oracle_from('final_sized', ('split', 'shard'))}
      SELECT split, shard * 1000000 + bin AS seq_id FROM packed
    ),
    nseq AS (
      SELECT split, CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences
      FROM packed_all GROUP BY split
    ),
    funnel AS (
      SELECT split,
             CAST(COUNT(*) AS BIGINT) AS docs_in,
             CAST(SUM(CASE WHEN NOT gate_ok THEN 1 ELSE 0 END)
                  AS BIGINT) AS gate_dropped,
             CAST(SUM(CASE WHEN gate_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
                  AS BIGINT) AS dedup_dropped,
             CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND NOT media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS media_dropped,
             CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
             CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                           AND n_removed > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_cut,
             CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                           THEN n_removed
                           ELSE 0 END) AS BIGINT) AS tokens_cut,
             CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                           THEN n_tokens - n_removed
                           ELSE 0 END) AS BIGINT) AS tokens_kept
      FROM staged GROUP BY split
    )
    SELECT f.split, f.docs_in, f.gate_dropped, f.dedup_dropped,
           f.media_dropped, f.docs_kept, f.docs_cut, f.tokens_cut,
           f.tokens_kept,
           CAST(COALESCE(n.n_sequences, 0) AS BIGINT) AS n_sequences
    FROM funnel f LEFT JOIN nseq n ON n.split = f.split
    """


def funnel_from_staged(staged: DataFrame) -> DataFrame:
    """The capstone funnel computed from ANY staged-decisions frame
    (direct shared_frame build or the pipeline30 bucketed re-read):
    per-split funnel aggregate + (split, shard) best-fit pack for
    n_sequences.  One Spark definition of the funnel, so the bucketed
    twin cannot drift from the registered capstone.  Stage order
    (drops attribute to the FIRST failing stage): gate, dedup, media."""
    kept_ok = F.col("gate_ok") & F.col("dedup_ok") & F.col("media_ok")
    sized = staged.where(kept_ok).select(
        "doc_id",
        (F.col("n_tokens") - F.col("n_removed")).alias("n_tokens"),
        _shard_col(),
        "split",
    )
    packed = sized.groupBy("split", "shard").applyInPandas(
        _pack_with_split,
        schema=(
            "doc_id long, n_tokens long, shard long, "
            "seq_id long, off_in_seq long, split string"
        ),
    )
    nseq = packed.groupBy("split").agg(
        F.count_distinct("seq_id").alias("n_sequences")
    )
    funnel = staged.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum((~F.col("gate_ok")).cast("long")).alias("gate_dropped"),
        F.sum((F.col("gate_ok") & ~F.col("dedup_ok")).cast("long")).alias(
            "dedup_dropped"
        ),
        F.sum(
            (F.col("gate_ok") & F.col("dedup_ok") & ~F.col("media_ok")).cast(
                "long"
            )
        ).alias("media_dropped"),
        F.sum(kept_ok.cast("long")).alias("docs_kept"),
        F.sum((kept_ok & (F.col("n_removed") > 0)).cast("long")).alias(
            "docs_cut"
        ),
        F.sum(F.when(kept_ok, F.col("n_removed")).otherwise(0))
        .cast("long")
        .alias("tokens_cut"),
        F.sum(
            F.when(kept_ok, F.col("n_tokens") - F.col("n_removed")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("tokens_kept"),
    )
    return funnel.join(nseq, "split", "left").withColumn(
        "n_sequences", F.coalesce("n_sequences", F.lit(0)).cast("long")
    )


@query("curation_pipeline_e2e", oracle=E2E_FUNNEL_ORACLE)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel, one row per train/val split:
    docs_in → gate_dropped (quality verdict != 'keep') →
    dedup_dropped (gate-kept but not its near-dup cluster's keeper) →
    media_dropped (a media-carrying doc that is not its perceptual
    cluster's survivor — the pipeline35 carrier-survivor stage, r12) →
    docs_kept, with docs_cut / tokens_cut (substring-dup removal on
    the kept set), tokens_kept (post-cut), and n_sequences (best-fit
    packed {PACK_SHARD}-doc-shard sequences of the kept set). The
    telescoping identity docs_in = gate_dropped + dedup_dropped +
    media_dropped + docs_kept holds per split by construction and is
    pinned by the reconciliation property test.

    100 TB shape: each stage keeps its own registered plan (gate: pure
    per-row scan; cut: fixed-width-key shuffles only; dedup: the
    shared_frame cluster assignment, materialized ONCE per pipeline
    run and reused here — registry.shared_frame; split: one left join
    vs the small cluster frame). The composition adds three doc_id
    equi-joins of per-doc DECISION columns (narrow longs/booleans —
    the text never joins), one (split, shard) applyInPandas pack over
    the kept set, and constant-size aggregates. Every stage decision
    is also independently driver-gated, so a funnel regression
    bisects to its stage in one artifact read."""
    return funnel_from_staged(staged_decisions(spark, sf_dir))
