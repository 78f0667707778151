"""Erasure reaches the STREAMING state: purge of the admit stores.

``erasure_derived_stores`` (operators/pipeline35) cascades a
right-to-erasure request through every batch-derived store; the one
derived store it could not touch was the streaming admit's standing
state — the per-doc decisions artifact and the versioned seen-cluster
set that ``streaming_curation_admit`` maintains across micro-batches.
This module closes that gap:

- ``purge_erased_state``: given a finished admit run's state dir,
  (1) writes the erased doc ids as TOMBSTONES first — the admit
  stream's merge anti-joins them on the arrival side, so a crash
  mid-purge already leaves replay protection in place, and an
  at-least-once redelivery of an old batch file can never resurrect
  an erased subject; (2) advances the seen-set one version, dropping
  every cluster whose members were ALL erased (a cluster with a
  surviving member stays seen — its content fingerprint is still
  evidenced by a non-erased doc); (3) rewrites the decisions
  artifact without the erased rows via the temp-and-swap commit
  discipline (the kvtext/mr tmp+rename convention,
  reference main/mrworker.go-style atomic visibility).
- ``streaming_admit_erasure_audit``: the gated audit row set — per
  batch, decision rows before / erased / after, and one row for the
  seen-set's cluster occupancy — in ``erasure_derived_stores``'s
  (store, key, n_before, n_erased, n_after) shape.  The DuckDB
  oracle states the same counts in closed form (every document
  arrives exactly once, so the decisions store is the split frame
  per batch; the seen-set is its distinct clusters; a dead cluster
  is one with no surviving member), and the reconciliation pytest
  pins the audit's erased total against the batch-side
  ``ERASE_MOD`` carve-out — the SAME subject set the relational
  cascade and the derived-store audit use, so erasure is one
  definition across batch and streaming.

100 TB shape: the purge is two anti-joins on the state's own keys
(doc_id, group_id) plus one rewrite of the per-doc decisions — cost
proportional to the STATE, never the corpus; the seen-set advance is
the same versioned overwrite the stream itself performs per batch.

Crash-replay pin (tests/test_admit_erasure.py): purge, then redeliver
an already-processed batch file — the erased ids must not reappear in
the decisions artifact and purged clusters must not re-enter the
seen-set."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD
from go_map_reduce_spark.registry import ORACLES, query
from go_map_reduce_spark.session import ensure_session_confs
from go_map_reduce_spark.streaming.admit import (
    N_STREAM_BATCHES,
    _latest_seen_version,
    finished_admit_state,
)

def _erased():
    # built lazily: Column construction needs an active SparkContext,
    # which does not exist at import time
    return (F.col("doc_id") % ERASE_MOD) == 0


def purge_erased_state(spark: SparkSession, tmp: str) -> None:
    """Apply the ERASE_MOD carve-out to a finished admit run's state
    under ``tmp`` (module docstring: tombstones first, then the
    seen-set version advance, then the decisions temp-and-swap)."""
    dec_dir = os.path.join(tmp, "decisions")
    seen_root = os.path.join(tmp, "seen")
    erased_dir = os.path.join(tmp, "erased")

    raw = spark.read.parquet(dec_dir)
    # 1. tombstones — replay protection must exist before anything
    #    else changes, so a crash mid-purge fails safe.
    raw.select("doc_id").where(_erased()).distinct().write.mode(
        "overwrite"
    ).parquet(erased_dir)
    # 2. seen-set: drop clusters with no surviving member.
    dead = (
        raw.groupBy("group_id")
        .agg(F.max((~_erased()).cast("int")).alias("alive"))
        .where(F.col("alive") == 0)
        .select("group_id")
    )
    v = _latest_seen_version(seen_root)
    if v > 0:
        seen = spark.read.parquet(os.path.join(seen_root, f"v{v}"))
        seen.join(dead, "group_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(os.path.join(seen_root, f"v{v + 1}"))
    # 3. decisions rewrite, temp-and-swap: materialize the survivors
    #    BEFORE touching the source dir (the plan reads it), then make
    #    the purged artifact visible with one rename.
    survivors = raw.where(~_erased()).localCheckpoint(eager=True)
    staged = dec_dir + ".purge_tmp"
    survivors.write.mode("overwrite").parquet(staged)
    shutil.rmtree(dec_dir)
    os.rename(staged, dec_dir)


@query(
    "streaming_admit_erasure_audit",
    oracle=f"""
    WITH splitq AS ({ORACLES["leakage_safe_split"]}),
    b AS (
      SELECT s.doc_id, s.doc_id % {N_STREAM_BATCHES} AS batch_id,
             s.group_id, (s.doc_id % {ERASE_MOD} = 0) AS erased
      FROM splitq s
    )
    SELECT 'decisions' AS store, CAST(batch_id AS VARCHAR) AS key,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN erased THEN 1 ELSE 0 END) AS BIGINT)
             AS n_erased,
           CAST(SUM(CASE WHEN NOT erased THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after
    FROM b GROUP BY batch_id
    UNION ALL
    SELECT 'seen', 'groups',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN NOT dead THEN 1 ELSE 0 END) AS BIGINT)
    FROM (
      SELECT group_id,
             (MAX(CASE WHEN NOT erased THEN 1 ELSE 0 END) = 0) AS dead
      FROM b GROUP BY group_id
    )
    """,
)
def streaming_admit_erasure_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the registered 4-batch admit stream, apply the erasure
    purge, and audit what it did to the two state stores — counts
    read back from the REAL before/after state on disk, not recomputed
    from the inputs (the audit must catch a broken purge, so it cannot
    share the purge's own arithmetic).  Output rows in
    erasure_derived_stores' shape: ('decisions', batch_id, rows
    before/erased/after) per micro-batch and ('seen', 'groups',
    clusters before/dropped/after).  The oracle states the closed
    form; the pytest twin additionally pins replay safety (an erased
    id cannot re-enter via a redelivered batch file) and that the
    subject set reconciles with the batch-side erasure carve-out."""
    ensure_session_confs(spark)
    # The finished admit state is the session-memoized run shared with
    # streaming_curation_admit (admit.finished_admit_state); the purge
    # MUTATES its stores, so copy them into a private tmp first — the
    # copy is state-sized (per-doc decisions + cluster keys), a
    # fraction of re-running the 4-trigger stream, and keeps the
    # memoized directory read-only for other consumers.
    shared = finished_admit_state(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="gmrs_admit_erase_")
    try:
        shutil.copytree(
            os.path.join(shared, "decisions"), os.path.join(tmp, "decisions")
        )
        shutil.copytree(
            os.path.join(shared, "seen"), os.path.join(tmp, "seen")
        )

        dec_dir = os.path.join(tmp, "decisions")
        seen_root = os.path.join(tmp, "seen")
        pre_dec = (
            spark.read.parquet(dec_dir)
            .groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_before"),
                F.sum(_erased().cast("long")).cast("long").alias("n_erased"),
            )
            .localCheckpoint(eager=True)
        )
        v0 = _latest_seen_version(seen_root)
        seen_before = (
            spark.read.parquet(os.path.join(seen_root, f"v{v0}"))
            .distinct()
            .count()
        )

        purge_erased_state(spark, tmp)

        post_dec = (
            spark.read.parquet(dec_dir)
            .groupBy("batch_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_after"))
            .localCheckpoint(eager=True)
        )
        v1 = _latest_seen_version(seen_root)
        seen_after = (
            spark.read.parquet(os.path.join(seen_root, f"v{v1}"))
            .distinct()
            .count()
        )

        dec_rows = (
            pre_dec.join(post_dec, "batch_id", "left")
            .select(
                F.lit("decisions").alias("store"),
                F.col("batch_id").cast("string").alias("key"),
                "n_before",
                "n_erased",
                F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            )
        )
        seen_row = spark.createDataFrame(
            [
                (
                    "seen",
                    "groups",
                    seen_before,
                    seen_before - seen_after,
                    seen_after,
                )
            ],
            "store string, key string, n_before long, n_erased long, "
            "n_after long",
        )
        return dec_rows.unionByName(seen_row).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
