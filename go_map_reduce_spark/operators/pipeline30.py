"""Round-9 pipeline operators: the incremental capstone and the
run-over-run drift report.

``curation_incremental_admit`` is the daily-batch form of the round-8
capstone: a 100 TB pipeline does not re-curate the corpus every day —
it admits or rejects the DAY'S BATCH against standing state.  The
deterministic ~10% new batch (pipeline20's doc_id % 10 == 7 split)
flows through the same registered stage decisions as the full funnel
(quality gate, substring cut, keep-best dedup, leakage-safe split) PLUS
the two index-facing rejections an incremental run adds: a direct
verified near-dup match against the standing index
(``incremental_dedup_new_batch`` — the asymmetric new⋈index band join)
and membership in a near-dup cluster that already contains a standing
document (content the index has already seen, kept or rejected).  The
emitted rows are the capstone's funnel columns, for the batch only.

``curation_drift_report`` is the artifact a data team reads before
shipping a recipe change: the per-split funnel of revision A (the
registered gate) diffed against revision B (the same funnel with a
stricter minimum-length gate), one row per (split, metric) with both
values and the delta — the ``snapshot_diff_customers`` pattern applied
to the capstone's output, with the per-stage rows attributing WHERE the
delta comes from.

Reference anchor: the daily-rerun shape is the reference's operating
model (main/test-mr-many.sh:15-22 — repeated whole-pipeline trials);
the drift diff is its two-run output comparison (main/test-mr.sh:90)
promoted to a queryable artifact.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from go_map_reduce_spark.operators.pipeline20 import (
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
    incremental_dedup_new_batch,
)
from go_map_reduce_spark.operators.pipeline23 import (
    doc_quality_composite_gate,
)
from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut
from go_map_reduce_spark.operators.pipeline26 import (
    _pack_oracle_from,
    _shard_col,
    dedup_keep_best_quality,
    leakage_safe_split,
)
from go_map_reduce_spark.operators.pipeline27 import (
    E2E_FUNNEL_ORACLE,
    STAGED_ORACLE,
    _pack_with_split,
    funnel_from_staged,
    staged_decisions,
)
from go_map_reduce_spark.operators.pipeline35 import media_keep_decision
from go_map_reduce_spark.operators.textstats import PACK_SHARD
from go_map_reduce_spark.registry import ORACLES, query

# --------------------------------------------------------------------------
# Incremental admit: the daily batch against the standing corpus
# --------------------------------------------------------------------------

_IS_BATCH_SQL = f"doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}"


def _batch_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-doc decision frame (doc_id, split, gate_ok, n_tokens,
    n_removed, has_index, admit_ok, media_ok, direct_match) — the
    incremental funnel's staged_decisions analogue, exposed so the
    property tests (no-double-admit, no-straddle,
    standing-plus-admitted reconciliation) pin doc-level invariants
    the aggregate can't.

    Drop attribution (mirrors funnel_from_staged, r12 ADVICE): a
    dropped doc is attributed to the FIRST failing stage in the order
    gate, dedup, media — so a batch doc failing both admit_ok and
    media_ok lands in dedup_dropped (media_dropped requires
    admit_ok)."""
    staged = staged_decisions(spark, sf_dir)
    ls = leakage_safe_split(spark, sf_dir).select("doc_id", "group_id")
    is_index = (F.col("doc_id") % NEW_BATCH_MOD) != NEW_BATCH_REM
    gh = ls.groupBy("group_id").agg(
        (F.max(is_index.cast("int")) == 1).alias("has_index")
    )
    inc = incremental_dedup_new_batch(spark, sf_dir).select(
        "doc_id", "is_near_dup"
    )
    return (
        staged.where((F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM)
        .join(ls, "doc_id")
        .join(gh, "group_id")
        .join(inc, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            "gate_ok",
            "n_tokens",
            "n_removed",
            "has_index",
            (
                F.col("dedup_ok")
                & ~F.col("has_index")
                & ~F.coalesce("is_near_dup", F.lit(False))
            ).alias("admit_ok"),
            "media_ok",
            F.coalesce("is_near_dup", F.lit(False)).alias("direct_match"),
        )
    )


@query(
    "curation_incremental_admit",
    oracle=f"""
    WITH staged AS ({STAGED_ORACLE}),
    splitq AS ({ORACLES["leakage_safe_split"]}),
    inc AS ({ORACLES["incremental_dedup_new_batch"]}),
    gh AS (
      SELECT group_id,
             MAX(CASE WHEN doc_id % {NEW_BATCH_MOD} <> {NEW_BATCH_REM}
                      THEN 1 ELSE 0 END) = 1 AS has_index
      FROM splitq GROUP BY group_id
    ),
    b AS (
      SELECT st.doc_id, st.split, st.gate_ok, st.n_tokens, st.n_removed,
             (st.dedup_ok AND NOT gh.has_index
              AND NOT COALESCE(i.is_near_dup, FALSE)) AS admit_ok,
             st.media_ok,
             COALESCE(i.is_near_dup, FALSE) AS direct_match
      FROM staged st
      JOIN splitq s ON s.doc_id = st.doc_id
      JOIN gh ON gh.group_id = s.group_id
      LEFT JOIN inc i ON i.doc_id = st.doc_id
      WHERE st.doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}
    ),
    packed_all AS (
      WITH RECURSIVE final_sized AS (
        SELECT doc_id, n_tokens - n_removed AS n_tokens,
               doc_id // {PACK_SHARD} AS shard, split
        FROM b WHERE gate_ok AND admit_ok AND media_ok
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
             CAST(SUM(CASE WHEN gate_ok AND NOT admit_ok THEN 1 ELSE 0 END)
                  AS BIGINT) AS dedup_dropped,
             CAST(SUM(CASE WHEN gate_ok AND admit_ok AND NOT media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS media_dropped,
             CAST(SUM(CASE WHEN gate_ok AND admit_ok AND media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
             CAST(SUM(CASE WHEN gate_ok AND admit_ok AND media_ok
                           AND n_removed > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_cut,
             CAST(SUM(CASE WHEN gate_ok AND admit_ok AND media_ok
                           THEN n_removed
                           ELSE 0 END) AS BIGINT) AS tokens_cut,
             CAST(SUM(CASE WHEN gate_ok AND admit_ok AND media_ok
                           THEN n_tokens - n_removed
                           ELSE 0 END) AS BIGINT) AS tokens_kept,
             CAST(SUM(CASE WHEN direct_match THEN 1 ELSE 0 END)
                  AS BIGINT) AS index_matched
      FROM b GROUP BY split
    )
    SELECT f.split, f.docs_in, f.gate_dropped, f.dedup_dropped,
           f.media_dropped, f.docs_kept, f.docs_cut, f.tokens_cut,
           f.tokens_kept,
           CAST(COALESCE(n.n_sequences, 0) AS BIGINT) AS n_sequences,
           f.index_matched
    FROM funnel f LEFT JOIN nseq n ON n.split = f.split
    """,
)
def curation_incremental_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone funnel for the DAILY BATCH (doc_id % 10 == 7, the
    deterministic "today's crawl" of ``incremental_dedup_new_batch``):
    per train/val split — docs_in → gate_dropped → dedup_dropped →
    media_dropped (the pipeline35 carrier-survivor stage, r12) →
    docs_kept (ADMITTED), with docs_cut / tokens_cut / tokens_kept /
    n_sequences over the admitted set, plus index_matched (batch docs
    with a direct verified near-dup in the standing index).  A batch
    doc is ADMITTED iff it passes the quality gate AND survives every
    dedup rejection an incremental run applies:

    - it is its near-dup cluster's keep-best keeper (the full
      pipeline's decision — for index-free clusters the batch-local
      and corpus-wide keeper coincide, since every member IS batch);
    - its cluster contains NO standing-index document (content the
      index has already seen — whether the index kept or gate-dropped
      it — must not be re-admitted; re-admitting a rejected doc's
      near-dup would resurrect rejected material);
    - it has no direct verified match against the index
      (``incremental_dedup_new_batch``'s asymmetric new⋈index band
      join — implied by the cluster rejection whenever the pair
      universes align, kept explicit because at 100 TB the direct
      match is the CHEAP daily signal while cluster state may lag a
      compaction cycle behind).

    The split column is the cluster-keyed leakage-safe split, so an
    admitted doc can never straddle the train/val boundary against
    EITHER the standing corpus or its own batch (pinned, with the
    no-double-admit and exact standing-plus-admitted reconciliation
    identities, in tests/test_round9_pipeline30.py).

    100 TB shape: every stage keeps its registered plan (the cluster
    assignment reads the shared_frame blocks; the new⋈index join is
    new-batch-sized on one side); this composition adds doc_id
    equi-joins of narrow decision columns, one tiny group-level
    aggregate (has_index, cluster-count-sized), and the per-(split,
    shard) pack over the admitted set only.  Daily work scales with
    the batch, not the corpus."""
    b = _batch_decisions(spark, sf_dir)
    kept_ok = F.col("gate_ok") & F.col("admit_ok") & F.col("media_ok")
    sized = b.where(kept_ok).select(
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
    funnel = b.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum((~F.col("gate_ok")).cast("long")).alias("gate_dropped"),
        F.sum((F.col("gate_ok") & ~F.col("admit_ok")).cast("long")).alias(
            "dedup_dropped"
        ),
        F.sum(
            (F.col("gate_ok") & F.col("admit_ok") & ~F.col("media_ok")).cast(
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
        F.sum(F.col("direct_match").cast("long")).alias("index_matched"),
    )
    return (
        funnel.join(nseq, "split", "left")
        .withColumn(
            "n_sequences", F.coalesce("n_sequences", F.lit(0)).cast("long")
        )
        .select(
            "split",
            "docs_in",
            "gate_dropped",
            "dedup_dropped",
            "media_dropped",
            "docs_kept",
            "docs_cut",
            "tokens_cut",
            "tokens_kept",
            "n_sequences",
            "index_matched",
        )
    )


# --------------------------------------------------------------------------
# Bucketed decision-frame layout: the capstone's joins without shuffles
# --------------------------------------------------------------------------

# The capstone's staged_decisions joins four corpus-wide per-doc
# decision frames on doc_id — correct, but at 100 TB those are four
# corpus-sized hash shuffles PER CONSUMER unless the frames are laid
# out co-bucketed.  A real pipeline materializes each stage's verdict
# as a doc_id-bucketed table once (the stage's own cost is paid
# anyway); every later composition — the funnel, the card, the drift
# report, any ad-hoc audit — then reads bucket i of all four tables
# and merges with ZERO Exchange.  write_staged_bucketed is that layout
# job; staged_decisions_bucketed is the exchange-free reader, emitting
# the IDENTICAL frame as staged_decisions (pinned by test + plan pin
# in tests/test_round9_pipeline30.py).
STAGED_BUCKETS = 8


def write_staged_bucketed(
    spark: SparkSession, sf_dir: str, prefix: str = "staged"
) -> None:
    """Materialize the five stage decision frames as doc_id-bucketed,
    bucket-sorted warehouse tables
    ({prefix}_gate/_cut/_keep/_split/_media).  One-time layout cost;
    each frame is narrow (doc_id + verdict columns, never text)."""
    from go_map_reduce_spark.sources.bucketed import write_bucketed

    frames = {
        "gate": doc_quality_composite_gate(spark, sf_dir).select(
            "doc_id", "verdict"
        ),
        "cut": substring_dup_cut(spark, sf_dir).select(
            "doc_id", "n_tokens", "n_removed"
        ),
        "keep": dedup_keep_best_quality(spark, sf_dir).select(
            "doc_id", "is_kept"
        ),
        "split": leakage_safe_split(spark, sf_dir).select("doc_id", "split"),
        "media": media_keep_decision(spark, sf_dir).select(
            "doc_id", "media_ok"
        ),
    }
    for name, df in frames.items():
        write_bucketed(df, f"{prefix}_{name}", "doc_id", STAGED_BUCKETS)


def staged_decisions_bucketed(
    spark: SparkSession, prefix: str = "staged"
) -> DataFrame:
    """staged_decisions re-read from the bucketed layout: the same
    (doc_id, split, gate_ok, dedup_ok, media_ok, n_tokens, n_removed)
    frame, composed as sort-merge joins over co-bucketed tables —
    Catalyst sees matching output partitionings on all five sides and
    plans ZERO Exchange (the merge hint keeps a small-scale run from
    broadcasting past the layout this function exists to prove)."""
    split = spark.table(f"{prefix}_split").hint("merge")
    gate = spark.table(f"{prefix}_gate").hint("merge")
    cut = spark.table(f"{prefix}_cut").hint("merge")
    keep = spark.table(f"{prefix}_keep").hint("merge")
    media = spark.table(f"{prefix}_media").hint("merge")
    return (
        split.join(gate, "doc_id")
        .join(cut, "doc_id")
        .join(keep, "doc_id", "left")
        .join(media, "doc_id")
        .select(
            "doc_id",
            "split",
            (F.col("verdict") == "keep").alias("gate_ok"),
            F.coalesce("is_kept", F.lit(True)).alias("dedup_ok"),
            "media_ok",
            "n_tokens",
            "n_removed",
        )
    )


def _bucketed_prefix(spark: SparkSession, sf_dir: str) -> str:
    """Warehouse table prefix for one dataset VERSION within one
    SESSION: keyed by the sf_dir path plus its listing fingerprint (so
    a rewrite of the data under the same path lands in fresh tables —
    the shared_frame keying rule, applied to the durable layout) plus
    the Spark applicationId (so two concurrent sessions sharing one
    spark-warehouse — e.g. parallel pytest and bench runs from the same
    cwd — write disjoint table names and can never see each other's
    live tables as orphans; r10 ADVICE item).  The layout was already
    once-per-session (the in-memory catalog forgets tables on exit), so
    the session token changes ownership, not the cost model."""
    import hashlib

    from go_map_reduce_spark.registry import _data_fingerprint

    tag = hashlib.md5(
        f"{sf_dir}:{_data_fingerprint(sf_dir)}:"
        f"{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:10]
    return f"stagedb_{tag}"


@query("curation_funnel_bucketed", oracle=E2E_FUNNEL_ORACLE)
def curation_funnel_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone funnel computed FROM THE BUCKETED LAYOUT: lay the
    four stage decision frames down doc_id-bucketed once
    (write_staged_bucketed), recompose staged_decisions with ZERO
    Exchange (staged_decisions_bucketed), and run the identical
    funnel_from_staged the direct capstone runs — same oracle, same
    output, different physical path.  This registers the repo's
    concrete 100 TB layout claim under the driver's correctness gate:
    at scale the four corpus-sized doc_id shuffles the direct
    composition pays PER CONSUMER are paid once at layout time, and
    every later consumer (this funnel, the card, the drift report,
    ad-hoc audits) reads bucket i of all four tables co-located.

    Lifecycle: the layout is written on first use per session (the
    default in-memory catalog does not persist table metadata across
    sessions; on a real deployment the bucketed tables live in a
    durable metastore and the write happens once per dataset
    VERSION).  The table prefix embeds the data-listing fingerprint,
    so a rewrite under the same path gets fresh tables.  First-
    consumer attribution (the r09 convention): whichever registered
    query touches the layout first in a session pays the four stage
    pipelines plus the bucketed write.

    Plan pin (tests/test_round10_bucketed_funnel.py): the registered
    plan contains no doc_id Exchange — the only shuffles left are the
    constant-size split/(split, shard) aggregates of the funnel
    itself."""
    prefix = _bucketed_prefix(spark, sf_dir)
    tables = [
        f"{prefix}_{t}" for t in ("gate", "cut", "keep", "split", "media")
    ]
    if not all(spark.catalog.tableExists(t) for t in tables):
        _clear_orphan_table_dirs(spark, tables)
        write_staged_bucketed(spark, sf_dir, prefix)
    return funnel_from_staged(staged_decisions_bucketed(spark, prefix))


# Stranded stagedb_* generations younger than this are left alone: a
# CONCURRENT session sharing this warehouse (parallel pytest + bench
# from one cwd) owns tables this session's in-memory catalog cannot
# see, and its prefix embeds its own applicationId so we cannot match
# by name either.  One hour comfortably exceeds any run in this repo
# (full marathon ~4 min, full pytest ~17 min... use 1h for margin);
# older dirs are dead generations from exited sessions.
_ORPHAN_MIN_AGE_SEC = 3600.0


def _clear_orphan_table_dirs(
    spark: SparkSession, tables: list[str], warehouse: str | None = None
) -> None:
    """Remove warehouse directories left behind by PREVIOUS sessions'
    managed tables: the default in-memory catalog forgets the table on
    session exit but leaves its files, and saveAsTable then refuses the
    name with LOCATION_ALREADY_EXISTS.  Sweeps (a) the requested table
    names — uniquely THIS session's, because the prefix embeds the
    applicationId — and (b) stranded ``stagedb_*`` generations older
    than _ORPHAN_MIN_AGE_SEC (the prefix embeds the data fingerprint
    and session id, so dataset rewrites and session exits would
    otherwise strand old generations' corpus-sized tables forever; the
    age guard keeps the sweep from deleting a CONCURRENT session's live
    tables, which this session's catalog cannot distinguish from
    orphans — r10 ADVICE item).  Only directories whose table is absent
    from the live catalog are touched, and only under this session's
    own warehouse dir."""
    import os
    import shutil
    import time
    from urllib.parse import urlparse

    wh = warehouse or urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    doomed = set(tables)
    now = time.time()
    try:
        for n in os.listdir(wh):
            if not n.startswith("stagedb_"):
                continue
            try:
                if now - os.stat(os.path.join(wh, n)).st_mtime < _ORPHAN_MIN_AGE_SEC:
                    continue
            except OSError:
                continue
            doomed.add(n)
    except OSError:
        pass
    for t in doomed:
        if not spark.catalog.tableExists(t):
            p = os.path.join(wh, t.lower())
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)


# --------------------------------------------------------------------------
# Run-over-run drift report
# --------------------------------------------------------------------------

# Revision B of the curation recipe: the same funnel with a stricter
# minimum-length gate on top of the registered composite verdict
# (documents under DRIFT_MIN_TOKENS post-gate are additionally
# dropped; the corpus median is ~56 tokens, so 30 moves a meaningful
# but non-degenerate share).  Dedup/cut/split decisions are corpus
# properties and stay shared between revisions — the modelled change
# is a GATE retune, the most common recipe revision.
DRIFT_MIN_TOKENS = 30

_FUNNEL_METRICS = [
    "docs_in",
    "gate_dropped",
    "dedup_dropped",
    "media_dropped",
    "docs_kept",
    "docs_cut",
    "tokens_cut",
    "tokens_kept",
]


def _sql_funnel(src: str, gate: str, out: str) -> str:
    """Per-split funnel CTE over a staged-decisions relation with the
    given gate predicate (text) substituted for gate_ok."""
    return f"""
    {out} AS (
      SELECT split,
             CAST(COUNT(*) AS BIGINT) AS docs_in,
             CAST(SUM(CASE WHEN NOT ({gate}) THEN 1 ELSE 0 END)
                  AS BIGINT) AS gate_dropped,
             CAST(SUM(CASE WHEN ({gate}) AND NOT dedup_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS dedup_dropped,
             CAST(SUM(CASE WHEN ({gate}) AND dedup_ok AND NOT media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS media_dropped,
             CAST(SUM(CASE WHEN ({gate}) AND dedup_ok AND media_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
             CAST(SUM(CASE WHEN ({gate}) AND dedup_ok AND media_ok
                           AND n_removed > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_cut,
             CAST(SUM(CASE WHEN ({gate}) AND dedup_ok AND media_ok
                           THEN n_removed
                           ELSE 0 END) AS BIGINT) AS tokens_cut,
             CAST(SUM(CASE WHEN ({gate}) AND dedup_ok AND media_ok
                           THEN n_tokens - n_removed ELSE 0 END)
                  AS BIGINT) AS tokens_kept
      FROM {src} GROUP BY split
    )"""


def _funnel_aggs(gate: Column, prefix: str) -> list[Column]:
    """The per-split funnel measures for one gate revision, aliased
    ``{prefix}{metric}`` — both revisions' lists go into ONE groupBy
    so the staged frame is aggregated in a single pass (two revisions
    = two conditional-aggregation column sets, not two scans of the
    expensive staged pipeline)."""
    kept = gate & F.col("dedup_ok") & F.col("media_ok")
    return [
        F.count(F.lit(1)).alias(f"{prefix}docs_in"),
        F.sum((~gate).cast("long")).alias(f"{prefix}gate_dropped"),
        F.sum((gate & ~F.col("dedup_ok")).cast("long")).alias(
            f"{prefix}dedup_dropped"
        ),
        F.sum((gate & F.col("dedup_ok") & ~F.col("media_ok")).cast("long")).alias(
            f"{prefix}media_dropped"
        ),
        F.sum(kept.cast("long")).alias(f"{prefix}docs_kept"),
        F.sum((kept & (F.col("n_removed") > 0)).cast("long")).alias(
            f"{prefix}docs_cut"
        ),
        F.sum(F.when(kept, F.col("n_removed")).otherwise(0))
        .cast("long")
        .alias(f"{prefix}tokens_cut"),
        F.sum(F.when(kept, F.col("n_tokens") - F.col("n_removed")).otherwise(0))
        .cast("long")
        .alias(f"{prefix}tokens_kept"),
    ]


def _drift_frame(
    staged: DataFrame, gate_a: Column, gate_b: Column
) -> DataFrame:
    """(split, metric, a_value, b_value, delta) rows diffing two
    funnel revisions computed off ONE staged frame IN ONE PASS —
    both revisions are conditional-aggregation column sets of the
    same groupBy, so the expensive staged pipeline runs exactly once
    (an earlier two-funnel formulation re-ran it per revision: 4.7 s
    → ~half at sf0.1).  The self-drift test drives this directly
    with gate_a == gate_b and pins every delta to exactly zero."""
    wide = staged.groupBy("split").agg(
        *_funnel_aggs(gate_a, "a_"), *_funnel_aggs(gate_b, "b_")
    )
    stack = ", ".join(f"'{m}', a_{m}, b_{m}" for m in _FUNNEL_METRICS)
    return wide.selectExpr(
        "split",
        f"stack({len(_FUNNEL_METRICS)}, {stack})"
        " AS (metric, a_value, b_value)",
    ).select(
        "split",
        "metric",
        "a_value",
        "b_value",
        (F.col("b_value") - F.col("a_value")).alias("delta"),
    )


@query(
    "curation_drift_report",
    oracle=f"""
    WITH staged AS ({STAGED_ORACLE}),
    {_sql_funnel('staged', 'gate_ok', 'fa')},
    {_sql_funnel('staged',
                 f'gate_ok AND n_tokens >= {DRIFT_MIN_TOKENS}', 'fb')},
    la AS (
      {' UNION ALL '.join(
          f"SELECT split, '{m}' AS metric, {m} AS a_value FROM fa"
          for m in _FUNNEL_METRICS)}
    ),
    lb AS (
      {' UNION ALL '.join(
          f"SELECT split, '{m}' AS metric, {m} AS b_value FROM fb"
          for m in _FUNNEL_METRICS)}
    )
    SELECT la.split, la.metric, la.a_value, lb.b_value,
           lb.b_value - la.a_value AS delta
    FROM la JOIN lb ON lb.split = la.split AND lb.metric = la.metric
    """,
)
def curation_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-over-run curation drift: the per-split funnel of revision A
    (the registered composite gate) diffed against revision B (the
    same funnel with the stricter >= {DRIFT_MIN_TOKENS}-token minimum
    length on top), one row per (split, metric in docs_in /
    gate_dropped / dedup_dropped / media_dropped / docs_kept /
    docs_cut / tokens_cut / tokens_kept) with both values and the
    delta.  The per-stage rows
    ATTRIBUTE the change: a gate retune moves mass from docs_kept into
    gate_dropped (and, second-order, out of dedup_dropped — a doc the
    new gate rejects can no longer be charged to dedup), and the
    token rows price the change in training data.  docs_in deltas are
    structurally zero here (same corpus both revisions) and act as
    the report's self-check row.

    100 TB shape: ONE staged-decisions pass (the expensive stages are
    computed once and shared — both revisions aggregate the same
    frame), two constant-size funnel aggregates, and a
    |splits|x|metrics| join; the diff costs nothing beyond the funnel
    itself.  Self-consistency is pinned by the A==A test: the drift
    of a run against itself is identically zero."""
    staged = staged_decisions(spark, sf_dir)
    gate_a = F.col("gate_ok")
    gate_b = F.col("gate_ok") & (F.col("n_tokens") >= DRIFT_MIN_TOKENS)
    return _drift_frame(staged, gate_a, gate_b)
