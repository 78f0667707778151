"""Reproducibility properties: the engine's core determinism claims,
property-tested.

1. dsum is partitioning-invariant: the same column summed under any
   repartitioning yields bit-identical doubles (the whole point of the
   decimal detour — a plain double sum fails this).
2. The hash partitioner is consistent: one key never lands in two
   partitions (the reference's F4 contract, mr/worker.go:21-25, where
   correctness depends only on co-location, not hash identity).
3. Registered queries are repeat-run stable (the test-mr-many.sh idea).
"""

import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from go_map_reduce_spark.functions.numeric import dsum
from go_map_reduce_spark.registry import QUERIES


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=300,
    ),
    seed=st.integers(0, 2**31),
)
def test_dsum_partitioning_invariant(spark, vals, seed):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rng = random.Random(seed)
    results = set()
    for n in (1, 3, 8):
        shuffled = df.repartition(n)
        results.add(shuffled.agg(dsum(F.col("v")).alias("s")).collect()[0]["s"])
    assert len(results) == 1, f"dsum not partitioning-invariant: {results}"


def test_hash_partitioning_colocates_keys(spark):
    df = spark.createDataFrame(
        [(f"k{i % 17}", i) for i in range(1000)], "key string, v long"
    )
    parts = (
        df.repartition(8, "key")
        .select("key", F.spark_partition_id().alias("pid"))
        .distinct()
        .groupBy("key")
        .agg(F.count_distinct("pid").alias("n_pids"))
        .collect()
    )
    assert all(r["n_pids"] == 1 for r in parts)


@pytest.mark.parametrize("name", ["wordcount", "q1_pricing_summary", "minhash_signatures"])
def test_repeat_run_stability(name, spark, sf_dir):
    a = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    assert a == b


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",        # decimal sufficient statistics
        "unigram_logprob_scores",    # dsum of 6dp ln() terms
        "pagerank_supplier_part",    # iterative decimal contributions
        "rfm_customer_segments",     # global ntile windows
        "knn_label_purity_ann",      # r05 bucket cap: row_number over
                                     # unique vec_id must be partition-
                                     # count-invariant
        "multimodal_jpeg_decode",    # r05 mixed-layout codec synth:
                                     # pure per-row maps, no shuffle
    ],
)
def test_parallelism_invariance(name, spark, sf_dir):
    """The determinism contract's strongest form: changing the shuffle
    partition count (3 vs the session's 8) must not change ANY result
    cell — the float discipline (decimal sums, rounded transcendental
    tails) makes aggregation order immaterial, and this pins it at the
    whole-query level rather than per-primitive."""
    key = "spark.sql.shuffle.partitions"
    base = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    prev = spark.conf.get(key)
    spark.conf.set(key, "3")
    try:
        alt = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set(key, prev)
    assert base == alt
