"""Calibration of the Expand-strategy auditor (tools/expand_sweep.py).

'FLAGGED: none' is only meaningful if the detector provably fires on
the pathology it hunts: reconstruct the exact pre-cc10b99 shape (one
Aggregate mixing an HLL++ sketch with multi-distinct exact counts —
sketch buffers replicated per (group, distinct-value) Expand row) and
assert it flags; assert the shipped split-and-join shape does not."""

import pytest
from pyspark.sql import functions as F

from tools.expand_sweep import WIDE_BUFFER, _expand_under_wide_aggregate


def _plan(df, spark) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_detector_fires_on_the_known_bad_shape(spark, sf_dir):
    """The pre-fix approx_distinct_sketch: sketch + two exact
    distincts in ONE aggregate — Catalyst plans the distincts via
    Expand and the sketch buffers ride every expanded partial group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    plan = _plan(bad, spark)
    assert "Expand" in plan
    assert _expand_under_wide_aggregate(plan), plan


def test_detector_passes_the_fixed_split_shape(spark, sf_dir):
    """The cc10b99 fix: sketch aggregate and exact-distinct aggregate
    computed separately and joined on the group key — the Expand and
    the sketch buffers live in sibling subtrees and must NOT flag."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    plan = _plan(sketch.join(exact, "l_returnflag"), spark)
    assert "Expand" in plan  # the exact side still expands
    assert WIDE_BUFFER.search(plan)  # and the sketch is in the plan
    assert _expand_under_wide_aggregate(plan) == [], plan


def test_registered_sketch_query_is_clean(spark, sf_dir):
    """The shipped approx_distinct_sketch holds the fixed shape."""
    from go_map_reduce_spark.registry import QUERIES

    plan = _plan(QUERIES["approx_distinct_sketch"](spark, sf_dir), spark)
    assert _expand_under_wide_aggregate(plan) == []


def test_exit_codes_distinguish_pathology_from_env_failure():
    """r10 ADVICE closure: a frame-build error (environment problem)
    must not masquerade as the Expand pathology.  1 = flagged (and it
    dominates), 2 = errors only, 0 = clean."""
    from tools.expand_sweep import _exit_code

    assert _exit_code([], []) == 0
    assert _exit_code([("q", "Aggregate")], []) == 1
    assert _exit_code([], [("q", "err")]) == 2
    assert _exit_code([("q", "Aggregate")], [("r", "err")]) == 1
