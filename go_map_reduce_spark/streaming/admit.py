"""Streaming curation admit: first-arrival-wins dedup against
standing state, as a Structured Streaming pipeline.

``curation_incremental_admit`` (operators/pipeline30) admits ONE daily
batch against standing state; this operator runs the ingest loop
itself: documents arrive in micro-batches (a file per trigger), and
each batch is admitted against the seen-cluster state that the
PREVIOUS batches built — genuinely sequential state, not a batch
computation in disguise.  Per arriving batch:

- a document whose near-dup cluster (the leakage-safe split's group
  key: large-star cluster, or the doc itself) was seen in ANY earlier
  batch is rejected (``seen``) — content the pipeline has already
  accepted or refused must not re-enter, whether the earlier copy was
  kept or gate-dropped;
- among the batch's arrivals of an UNSEEN cluster, the keep-best
  keeper (n_tokens desc, doc_id — the dedup_keep_best_quality
  ordering) is admitted iff it passes the composite quality gate AND
  the media stage (non-carrier, or its perceptual media cluster's
  survivor — the pipeline35 media_keep_decision term, r13);
- every arriving cluster is then marked seen, gate outcome
  notwithstanding.

Drop attribution follows the funnel's first-failing-stage order —
gate, dedup, media (pipeline30's documented discipline): a doc that
fails both the dedup election and the media stage lands in
dedup_dropped; media_dropped requires winning the dedup election.

The DuckDB oracle is the sequential recurrence COLLAPSED in closed
form: first-seen-wins means a cluster admits only in its minimal
batch, so the whole stream replays as one window query (min batch per
group; keeper ranked among minimal-batch members) — the gate proves
the streaming state machine equals its batch semantics on every
micro-batch boundary the deterministic ``doc_id % N`` slicing
produces.

Arrival order is pinned, not assumed: batch files get strictly
increasing mtimes (``os.utime``), FileStreamSource picks oldest
first at one file per trigger, and the decisions artifact records
(epoch, batch_id) so the restart test can assert the bijection.

State and restart: the seen-set and the per-doc decisions live in
versioned/appended parquet maintained by ``foreachBatch`` (the
incremental-MV pattern — the escape hatch for merge semantics the
built-in sinks lack); the checkpoint makes the stream resumable, and
the restart test stops after two files, delivers two more, restarts
on the SAME checkpoint, and pins the final state equal to the
one-shot run.  At-least-once caveat (documented, not hidden): a
crash BETWEEN a decisions append and checkpoint commit could replay
one batch's appends; a production sink dedups on (batch_id, doc_id)
or writes through a transactional table format — the clean-stop
restart path exercised here commits atomically.

100 TB shape: the per-batch work is batch-sized (one join against
the standing seen-set on the cluster key, one window over the
batch's own groups); the seen-set grows by distinct clusters, not
documents; the side frame of per-doc verdicts is the registered
stage operators' output, computed once per run (and its expensive
cluster stage reads the shared_frame blocks).

Reference anchor: the reference's whole operating model is
sequential whole-corpus passes (main/test-mr-many.sh:15-22); this is
that loop with state carried between passes instead of recomputed.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.pipeline23 import (
    doc_quality_composite_gate,
)
from go_map_reduce_spark.operators.pipeline26 import leakage_safe_split
from go_map_reduce_spark.operators.pipeline35 import (
    _carrier,
    media_survivor_ids,
)
from go_map_reduce_spark.operators.textstats import text_quality_scores
from go_map_reduce_spark.registry import ORACLES, query
from go_map_reduce_spark.session import ensure_session_confs
from go_map_reduce_spark.streaming.windows import _stream_state_partitions

N_STREAM_BATCHES = 4  # micro-batches; batch_id = doc_id % N (one file each)


def _admit_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc static verdict frame the stream joins each micro-batch
    against: (doc_id, group_id, gate_ok, n_tokens, media_ok) from the
    registered stage operators — one definition of 'the pipeline's
    decisions', materialized once per run (eager localCheckpoint: four
    micro-batches re-read blocks instead of re-running the stages).

    media_ok (r13) is the pipeline35 media stage as a BROADCAST term:
    left-join the tiny admitted-carrier survivor set
    (``media_survivor_ids`` — ≤ #perceptual clusters rows) and pass
    non-carriers vacuously — the identical two units
    ``media_keep_decision`` composes, minus its extra documents scan
    (the side frame already carries every doc_id), so the stream's
    media verdict cannot drift from the batch funnel's and adds ZERO
    shuffles to the side build."""
    sv = media_survivor_ids(spark, sf_dir).withColumn("is_sv", F.lit(True))
    return (
        leakage_safe_split(spark, sf_dir)
        .select("doc_id", "group_id")
        .join(
            doc_quality_composite_gate(spark, sf_dir).select(
                "doc_id", (F.col("verdict") == "keep").alias("gate_ok")
            ),
            "doc_id",
        )
        .join(
            text_quality_scores(spark, sf_dir).select("doc_id", "n_tokens"),
            "doc_id",
            "left",
        )
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)).cast("long"))
        .join(F.broadcast(sv), "doc_id", "left")
        .withColumn(
            "media_ok",
            ~_carrier(F.col("doc_id")) | F.coalesce("is_sv", F.lit(False)),
        )
        .drop("is_sv")
        .localCheckpoint(eager=True)
    )


def _write_batch_files(
    spark: SparkSession,
    sf_dir: str,
    src_dir: str,
    batches: list[int],
    stage_dir: str,
    batch_col=None,
) -> None:
    """Write one single-file parquet per batch id into ``src_dir``,
    with strictly increasing mtimes so FileStreamSource's oldest-first
    pickup at maxFilesPerTrigger=1 delivers them in batch order.
    ``batch_col`` overrides the registered ``doc_id % N`` slicing —
    the first-arrival-wins collapse law holds for ANY deterministic
    assignment of docs to batches, and the property test exercises it
    with an md5-permille slicing to pin the LAW, not the instance."""
    os.makedirs(src_dir, exist_ok=True)
    if batch_col is None:
        batch_col = F.col("doc_id") % N_STREAM_BATCHES
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", batch_col.cast("long").alias("batch_id")
    )
    base = 1_000_000_000  # fixed epoch base: mtimes deterministic too
    for b in batches:
        stage = os.path.join(stage_dir, f"stage{b}")
        docs.where(F.col("batch_id") == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"batch{b}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (base + 60 * b, base + 60 * b))


def _latest_seen_version(state_root: str) -> int:
    if not os.path.isdir(state_root):
        return 0
    vs = [
        int(n[1:])
        for n in os.listdir(state_root)
        if n.startswith("v") and n[1:].isdigit()
    ]
    return max(vs, default=0)


def _decide_batch(
    side: DataFrame, batch_df: DataFrame, seen: DataFrame | None
) -> DataFrame:
    """The per-batch decision dataflow BOTH sinks share — one join
    against the standing seen-set on the cluster key, one keep-best
    window over the batch's own groups, one admitted predicate.  The
    registered append sink and the transactional twin (admit_txn.py)
    differ ONLY in durability protocol; factoring the semantics here
    removes the copy-drift channel (the _bpe_train_apply precedent:
    shared chains cannot diverge)."""
    b = batch_df.join(side, "doc_id")
    if seen is not None:
        b = b.join(
            seen.withColumn("is_seen", F.lit(True)), "group_id", "left"
        ).withColumn("is_seen", F.coalesce("is_seen", F.lit(False)))
    else:
        b = b.withColumn("is_seen", F.lit(False))
    w = W.partitionBy("group_id").orderBy(F.desc("n_tokens"), "doc_id")
    return (
        b.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "dedup_ok", ~F.col("is_seen") & (F.col("rk") == 1)
        )
        .select(
            "doc_id",
            "batch_id",
            "group_id",
            "gate_ok",
            "n_tokens",
            "is_seen",
            "dedup_ok",
            "media_ok",
            (
                F.col("gate_ok") & F.col("dedup_ok") & F.col("media_ok")
            ).alias("admitted"),
        )
    )


def _next_seen(marked_groups: DataFrame, prev: DataFrame | None) -> DataFrame:
    """The advanced seen-set: this batch's distinct cluster keys
    unioned into the previous version (shared by both sinks)."""
    if prev is not None:
        marked_groups = prev.unionByName(marked_groups)
    return marked_groups.distinct()


def _funnel_agg(dec: DataFrame) -> DataFrame:
    """Per-batch funnel aggregate over UNIQUE (batch_id, doc_id)
    decisions (shared by both sinks; the append sink dedups first,
    the transactional sink's protocol guarantees uniqueness).  Drops
    attribute to the FIRST failing stage — gate, dedup, media — so the
    funnel telescopes: docs_in = gate_dropped + dedup_dropped +
    media_dropped + admitted (the pipeline30 attribution order)."""
    gate, ddp, med = F.col("gate_ok"), F.col("dedup_ok"), F.col("media_ok")
    adm = F.col("admitted")
    return dec.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum((~gate).cast("long")).alias("gate_dropped"),
        F.sum((gate & ~ddp).cast("long")).alias("dedup_dropped"),
        F.sum((gate & ddp & ~med).cast("long")).alias("media_dropped"),
        F.sum(adm.cast("long")).alias("admitted"),
        F.sum(F.when(adm, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("tokens_admitted"),
    )


def _run_admit_stream(
    spark: SparkSession, side: DataFrame, tmp: str
) -> None:
    """One availableNow pass over whatever files are currently in
    ``tmp/src``: each pending file becomes a micro-batch whose
    decisions append to ``tmp/decisions`` and whose clusters merge
    into the versioned seen-set under ``tmp/seen`` — resuming from
    the checkpoint (and the on-disk seen version) left by any
    previous pass."""
    src_dir = os.path.join(tmp, "src")
    dec_dir = os.path.join(tmp, "decisions")
    seen_root = os.path.join(tmp, "seen")
    erased_dir = os.path.join(tmp, "erased")

    stream = (
        spark.readStream.schema("doc_id long, batch_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        # Erasure tombstones (admit_erasure.purge_erased_state): an
        # erased subject must never re-enter the state, INCLUDING via
        # an at-least-once replay of a batch file processed before the
        # purge — so the filter sits on the arrival side of every
        # merge, not only in the purge rewrite.
        if os.path.isdir(erased_dir):
            batch_df = batch_df.join(
                spark.read.parquet(erased_dir), "doc_id", "left_anti"
            )
        v = _latest_seen_version(seen_root)
        seen = (
            spark.read.parquet(os.path.join(seen_root, f"v{v}"))
            if v > 0
            else None
        )
        # Materialize the decision frame ONCE: it feeds two actions
        # (the decisions append, then the seen-set advance), and an
        # unmaterialized plan would re-run the batch x side x seen
        # joins for each — doubling per-trigger latency for nothing.
        d = (
            _decide_batch(side, batch_df, seen)
            .withColumn("epoch", F.lit(epoch_id).cast("long"))
            .localCheckpoint(eager=True)
        )
        d.write.mode("append").parquet(dec_dir)
        _next_seen(d.select("group_id"), seen).write.mode(
            "overwrite"
        ).parquet(os.path.join(seen_root, f"v{v + 1}"))

    with _stream_state_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()


_ADMIT_STATE_DIRS: dict[tuple, str] = {}


def _cleanup_admit_state_dirs() -> None:
    """Remove every memoized state dir at interpreter exit (r14 ADVICE:
    the memo kept tmpdirs alive that the pre-memo code removed in a
    finally — without this they accumulate in /tmp across runs)."""
    while _ADMIT_STATE_DIRS:
        _, d = _ADMIT_STATE_DIRS.popitem()
        shutil.rmtree(d, ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_cleanup_admit_state_dirs)


def finished_admit_state(spark: SparkSession, sf_dir: str) -> str:
    """Run the registered 4-batch admit stream ONCE per (SparkContext,
    data fingerprint) and memoize the FINISHED state directory — the
    registry.shared_frame convention applied to on-disk streaming
    state.  Both consumers of the finished run (the admit funnel and
    the erasure audit) are deterministic reads of this state; without
    the memo each one re-paid the full 4-trigger micro-batch lifecycle
    (side-frame build, 4 x decision/seen-set commits) per suite run.
    Consumers must treat the directory as READ-ONLY: the erasure audit
    copies the stores it mutates into its own tmp before purging."""
    from go_map_reduce_spark.registry import _data_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _data_fingerprint(sf_dir),
    )
    cached = _ADMIT_STATE_DIRS.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    for dead in [
        k
        for k in _ADMIT_STATE_DIRS
        if k[0] != key[0] or (k[1] == key[1] and k[2] != key[2])
    ]:
        shutil.rmtree(_ADMIT_STATE_DIRS.pop(dead), ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix="gmrs_stream_admit_")
    try:
        side = _admit_side(spark, sf_dir)
        _write_batch_files(
            spark,
            sf_dir,
            os.path.join(tmp, "src"),
            list(range(N_STREAM_BATCHES)),
            os.path.join(tmp, "stage"),
        )
        _run_admit_stream(spark, side, tmp)
    except BaseException:
        # a failed build must not leak its partial dir (r14 ADVICE)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _ADMIT_STATE_DIRS[key] = tmp
    return tmp


def _admit_funnel(spark: SparkSession, dec_dir: str) -> DataFrame:
    """Per-batch funnel over the decisions artifact (same stage order
    as the capstone: gate first, then every dedup rejection).

    The read path dedups on (batch_id, doc_id) first: the writer is
    at-least-once (a crash between a decisions append and the
    checkpoint commit replays that batch's appends — module
    docstring).  A replay from the common crash point (decisions
    appended, seen-set version not yet advanced) re-derives
    byte-identical rows, so the dedup makes the funnel exact there
    instead of double-counting docs_in/admitted.  In the narrower
    window where the seen-set DID advance before the crash, the
    replayed rows can differ in is_seen/admitted — the survivor pick
    is DETERMINISTIC (r10 ADVICE closure): max_by on
    (admitted, NOT is_seen, epoch) keeps the row written when the
    decision was actually MADE (before the seen-set advance marked
    the replay as already-seen), so repeated reads of the same
    decisions dir always agree and agree with the original run's
    funnel.  Closing the window fully (no divergent rows at all)
    needs the transactional sink — see admit_txn.py, which commits
    decisions and seen-set version atomically."""
    raw = spark.read.parquet(dec_dir)
    payload = [c for c in raw.columns if c not in ("batch_id", "doc_id")]
    dec = (
        raw.groupBy("batch_id", "doc_id")
        .agg(
            F.max_by(
                F.struct(*payload),
                F.struct(
                    F.col("admitted").cast("int"),
                    (~F.col("is_seen")).cast("int"),
                    F.col("epoch"),
                ),
            ).alias("r")
        )
        .select("batch_id", "doc_id", "r.*")
    )
    return _funnel_agg(dec)


@query(
    "streaming_curation_admit",
    oracle=f"""
    WITH splitq AS ({ORACLES["leakage_safe_split"]}),
    gateq AS ({ORACLES["doc_quality_composite_gate"]}),
    qual AS ({ORACLES["text_quality_scores"]}),
    mediaq AS ({ORACLES["media_admit_decision"]}),
    b AS (
      SELECT s.doc_id, s.doc_id % {N_STREAM_BATCHES} AS batch_id,
             s.group_id, (g.verdict = 'keep') AS gate_ok,
             CAST(COALESCE(q.n_tokens, 0) AS BIGINT) AS n_tokens,
             m.media_ok
      FROM splitq s
      JOIN gateq g ON g.doc_id = s.doc_id
      LEFT JOIN qual q ON q.doc_id = s.doc_id
      JOIN mediaq m ON m.doc_id = s.doc_id
    ),
    fb AS (SELECT group_id, MIN(batch_id) AS first_b FROM b GROUP BY group_id),
    k AS (
      SELECT b.doc_id,
             row_number() OVER (PARTITION BY b.group_id
                                ORDER BY b.n_tokens DESC, b.doc_id) AS rk
      FROM b JOIN fb f
        ON f.group_id = b.group_id AND b.batch_id = f.first_b
    ),
    d AS (
      SELECT b.batch_id, b.gate_ok, b.n_tokens, b.media_ok,
             (b.batch_id = f.first_b AND COALESCE(k.rk, 0) = 1) AS dedup_ok
      FROM b
      JOIN fb f ON f.group_id = b.group_id
      LEFT JOIN k ON k.doc_id = b.doc_id
    )
    SELECT batch_id,
           CAST(COUNT(*) AS BIGINT) AS docs_in,
           CAST(SUM(CASE WHEN NOT gate_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS gate_dropped,
           CAST(SUM(CASE WHEN gate_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS dedup_dropped,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND NOT media_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS media_dropped,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS admitted,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                         THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_admitted
    FROM d GROUP BY batch_id
    """,
)
def streaming_curation_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-arrival-wins streaming admit: the corpus arrives as
    4 mtime-ordered micro-batches (batch_id = doc_id % 4, one file
    per trigger); each batch is
    admitted against the seen-cluster state of the previous batches
    (module docstring has the full state machine), with the media
    stage applied to the dedup winner (r13).  Returns the per-batch
    funnel — docs_in, gate_dropped, dedup_dropped, media_dropped,
    admitted, tokens_admitted — and the oracle replays the sequential
    recurrence in closed form (min-batch per cluster + keeper rank +
    the media_admit_decision CTE), so the gate pins streaming state =
    batch semantics."""
    ensure_session_confs(spark)
    tmp = finished_admit_state(spark, sf_dir)
    return _admit_funnel(
        spark, os.path.join(tmp, "decisions")
    ).localCheckpoint(eager=True)
