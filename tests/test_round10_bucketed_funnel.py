"""Round-10: the bucketed staged-decision layout under the driver gate.

The r09 verdict's lead task: the zero-Exchange recompose held only a
pytest pin; ``curation_funnel_bucketed`` now computes the registered
capstone funnel FROM the bucketed layout, so the layout earns a
CORRECTNESS row.  These tests pin what the oracle differential can't:
that the bucketed path and the direct capstone return identical rows,
and that the registered plan really is free of doc_id shuffles (the
layout's whole point)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["curation_funnel_bucketed"](spark, sf_dir),
        ORACLES["curation_funnel_bucketed"],
        sf_dir,
    )


def test_bucketed_funnel_equals_direct_capstone(spark, sf_dir):
    """Same funnel, different physical path: the bucketed twin must
    return row-identical results to curation_pipeline_e2e (they share
    funnel_from_staged and the oracle string, so a divergence here
    means the LAYOUT changed the data)."""
    key = lambda r: r["split"]  # noqa: E731
    direct = sorted(
        QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect(), key=key
    )
    bucketed = sorted(
        QUERIES["curation_funnel_bucketed"](spark, sf_dir).collect(), key=key
    )
    assert [r.asDict() for r in bucketed] == [r.asDict() for r in direct]
    assert len(direct) > 0


def test_bucketed_funnel_plan_has_no_docid_exchange(spark, sf_dir):
    """The 100 TB claim, pinned on the REGISTERED query's physical
    plan: recomposing the four decision frames is sort-merge joins
    over co-bucketed scans with no doc_id Exchange anywhere — the only
    shuffles left are the funnel's own constant-size split/(split,
    shard) aggregates."""
    df = QUERIES["curation_funnel_bucketed"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(doc_id" not in plan, plan


def test_shares_oracle_with_direct_capstone():
    """One SQL definition of the funnel (the factoring convention):
    the bucketed twin registers the capstone's oracle string verbatim,
    so the two rows gate the same semantics."""
    assert (
        ORACLES["curation_funnel_bucketed"]
        == ORACLES["curation_pipeline_e2e"]
    )


def test_second_call_reuses_layout(spark, sf_dir):
    """Within one session the layout is written once: after a first
    call the four tables exist, and a second call plans against them
    without rewriting (tableExists short-circuits the write)."""
    from go_map_reduce_spark.operators.pipeline30 import _bucketed_prefix

    QUERIES["curation_funnel_bucketed"](spark, sf_dir).collect()
    prefix = _bucketed_prefix(spark, sf_dir)
    for t in ("gate", "cut", "keep", "split", "media"):
        assert spark.catalog.tableExists(f"{prefix}_{t}")
    import time

    t0 = time.monotonic()
    QUERIES["curation_funnel_bucketed"](spark, sf_dir).collect()
    # reuse is far cheaper than a relayout; generous bound to stay
    # noise-proof (first build includes four stage pipelines + writes)
    assert time.monotonic() - t0 < 60


def test_prefix_is_session_scoped(spark, sf_dir):
    """r10 ADVICE closure: two concurrent sessions sharing one
    spark-warehouse must write DISJOINT table names, so neither can
    mistake the other's live tables for orphans.  The prefix embeds the
    applicationId; same data + different session id => different
    prefix."""
    import hashlib

    from go_map_reduce_spark.operators.pipeline30 import _bucketed_prefix
    from go_map_reduce_spark.registry import _data_fingerprint

    mine = _bucketed_prefix(spark, sf_dir)
    other = hashlib.md5(
        f"{sf_dir}:{_data_fingerprint(sf_dir)}:other-app-id".encode()
    ).hexdigest()[:10]
    assert mine != f"stagedb_{other}"
    assert mine.startswith("stagedb_")


def test_orphan_sweep_spares_young_strangers(spark, tmp_path):
    """r10 ADVICE closure, the other half: the stranded-generation
    sweep must NOT rmtree a recent stagedb_* dir it doesn't own (it
    could be a concurrent session's live table), but must still clear
    (a) dirs it was explicitly asked for and (b) old dead generations."""
    import os
    import time

    from go_map_reduce_spark.operators.pipeline30 import (
        _ORPHAN_MIN_AGE_SEC,
        _clear_orphan_table_dirs,
    )

    wh = tmp_path / "wh"
    wh.mkdir()
    young = wh / "stagedb_young01_gate"
    old = wh / "stagedb_old001_gate"
    mine = wh / "stagedb_mine01_gate"
    for d in (young, old, mine):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    past = time.time() - _ORPHAN_MIN_AGE_SEC - 60
    os.utime(old, (past, past))

    _clear_orphan_table_dirs(spark, ["stagedb_mine01_gate"], warehouse=str(wh))

    assert young.is_dir(), "young stranger swept: concurrent-session hazard"
    assert not old.exists(), "old dead generation not swept"
    assert not mine.exists(), "explicitly requested dir not swept"
