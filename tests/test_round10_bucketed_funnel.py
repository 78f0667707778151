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
    prefix = _bucketed_prefix(sf_dir)
    for t in ("gate", "cut", "keep", "split"):
        assert spark.catalog.tableExists(f"{prefix}_{t}")
    import time

    t0 = time.monotonic()
    QUERIES["curation_funnel_bucketed"](spark, sf_dir).collect()
    # reuse is far cheaper than a relayout; generous bound to stay
    # noise-proof (first build includes four stage pipelines + writes)
    assert time.monotonic() - t0 < 60
