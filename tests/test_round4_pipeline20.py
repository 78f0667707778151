"""Incremental dedup (new batch vs standing index) — differential and
semantic pins."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["incremental_dedup_new_batch"](spark, sf_dir),
        ORACLES["incremental_dedup_new_batch"],
        sf_dir,
    )


def test_every_new_doc_reported_exactly_once(spark, sf_dir):
    from go_map_reduce_spark.operators.pipeline20 import (
        NEW_BATCH_MOD,
        NEW_BATCH_REM,
    )

    rows = QUERIES["incremental_dedup_new_batch"](spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    (n_new,) = con.sql(
        f"""SELECT COUNT(*) FROM documents
            WHERE doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}"""
    ).fetchone()
    assert len(ids) == n_new
    for r in rows:
        if r["is_near_dup"]:
            assert r["match_doc_id"] is not None
            assert r["match_jaccard"] is not None
            # the match comes from the INDEX side, never the new batch
            assert r["match_doc_id"] % NEW_BATCH_MOD != NEW_BATCH_REM
            assert 0.0 <= r["match_jaccard"] <= 1.0
        else:
            assert r["match_doc_id"] is None and r["match_jaccard"] is None


def test_matches_agree_with_symmetric_pipeline(spark, sf_dir):
    """Every (new, index) near-dup the incremental pipeline reports must
    also be a pair of the symmetric batch pipeline (restricted to
    cross-split pairs) and vice versa — the admit decision is the
    asymmetric VIEW of the same candidate+verify machinery, not a
    different similarity definition."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.operators.pipeline20 import (
        NEW_BATCH_MOD,
        NEW_BATCH_REM,
    )

    sym = QUERIES["minhash_near_dup_pairs"](spark, sf_dir).collect()
    cross = set()
    for r in sym:
        a_new = r["doc_a"] % NEW_BATCH_MOD == NEW_BATCH_REM
        b_new = r["doc_b"] % NEW_BATCH_MOD == NEW_BATCH_REM
        if a_new != b_new:
            new_id = r["doc_a"] if a_new else r["doc_b"]
            cross.add(new_id)
    inc = QUERIES["incremental_dedup_new_batch"](spark, sf_dir)
    flagged = {
        r["doc_id"] for r in inc.where(F.col("is_near_dup")).collect()
    }
    assert flagged == cross


def test_incremental_join_is_asymmetric_in_the_plan(spark, sf_dir):
    """The scale claim is structural: daily work joins NEW-batch bands
    against the INDEX bands exactly once — no cartesian product, no
    nested-loop, and only ONE join between band frames (a symmetric
    pipeline would self-join the full corpus). Pin it in the physical
    plan, not just prose."""
    from go_map_reduce_spark.registry import QUERIES

    df = QUERIES["incremental_dedup_new_batch"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_shuffle_joins = plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    n_broadcast_joins = plan.count("BroadcastHashJoin")
    # exactly ONE shuffle-side equality join — the NEW-bands ⋈
    # INDEX-bands candidate join; every other join broadcasts the small
    # (new-batch-derived) side. A symmetric full-corpus pipeline would
    # add a second large-side join here; a cartesian would trip the
    # asserts above.
    assert n_shuffle_joins == 1, plan
    assert n_shuffle_joins + n_broadcast_joins == 4, plan
