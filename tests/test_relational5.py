"""Differential tests for the TPC-H shape batch 3 (Q8/Q9/Q11/Q15/Q17/Q20)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_promotion_suppliers",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


@pytest.mark.parametrize(
    "name", ["q8_market_share", "q11_important_parts", "q20_promotion_suppliers"]
)
def test_nonempty(name, spark, sf_dir):
    assert QUERIES[name](spark, sf_dir).count() > 0


def test_q11_no_job_at_construction(spark, sf_dir):
    """The global-total threshold must be a lazy broadcast cross join,
    not a driver-side .collect()/.count() at query-construction time.

    Constructing the query may launch single-task parquet FOOTER-probe
    jobs (spark.read.parquet schema inference runs one per call on this
    build), so the invariant is: no multi-stage job — an eager count()
    or collect() over the aggregated frame would submit a shuffle job
    with >1 stages (and >1 tasks)."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    QUERIES["q11_important_parts"](spark, sf_dir)
    new_jobs = set(tracker.getJobIdsForGroup(None)) - before
    for jid in new_jobs:
        info = tracker.getJobInfo(jid)
        assert info is not None
        assert len(info.stageIds) == 1, (
            f"construction ran a shuffle job (stages={info.stageIds})"
        )
        stage = tracker.getStageInfo(info.stageIds[0])
        if stage is not None:
            assert stage.numTasks <= 2, (
                f"construction ran a data job ({stage.numTasks} tasks)"
            )
