"""Differential tests for pipeline batch 2 (cohort/SCD2/bloom/winsorize)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "cohort_retention",
    "scd2_customer_upsert",
    "bloom_contamination_prefilter",
    "winsorized_price_stats",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bloom_no_false_negatives(spark, sf_dir):
    """A bloom filter may overestimate membership, never underestimate:
    n_maybe >= n_exact for every test document."""
    df = QUERIES["bloom_contamination_prefilter"](spark, sf_dir).toPandas()
    assert (df.n_maybe >= df.n_exact).all()
    assert (df.n_ngrams >= df.n_maybe).all()


def test_scd2_key_versioning(spark, sf_dir):
    """Updated keys have exactly versions {1 closed, 2 current};
    untouched keys exactly one current version-1 row."""
    import pandas as pd

    df = QUERIES["scd2_customer_upsert"](spark, sf_dir).toPandas()
    per_key = df.groupby("c_custkey").agg(
        n=("version", "size"),
        n_current=("is_current", "sum"),
        max_v=("version", "max"),
    )
    updated = per_key.index % 7 == 0
    assert (per_key.loc[updated, "n"] == 2).all()
    assert (per_key.loc[updated, "max_v"] == 2).all()
    assert (per_key.loc[~updated, "n"] == 1).all()
    assert (per_key.n_current == 1).all()


def test_winsorized_mean_within_bounds(spark, sf_dir):
    df = QUERIES["winsorized_price_stats"](spark, sf_dir).toPandas()
    assert ((df.winsorized_mean >= df.p05) & (df.winsorized_mean <= df.p95)).all()
    assert (df.n_clipped > 0).all()


def test_cogroup_profile_oracle(spark, sf_dir):
    compare(
        QUERIES["cogroup_purchase_click_profile"](spark, sf_dir),
        ORACLES["cogroup_purchase_click_profile"],
        sf_dir,
    )


def test_transform_with_state_gated():
    """transformWithState registers exactly where a protobuf runtime
    exists. Since r07 the repo vendors one (vendor/README.md — this
    container has no site-packages protobuf and no PyPI route), so in
    this environment the gate is expected True and the query
    registered; on a machine with neither, it must be absent (gated),
    not broken."""
    from go_map_reduce_spark.streaming.stateful import _protobuf_available

    assert ("events_transform_with_state" in QUERIES) == _protobuf_available()


def test_transform_with_state_executes_where_protobuf_exists(spark, sf_dir):
    """The Spark-4 typed-state API's EXECUTED differential artifact
    (not just a registration gate): run the streaming query to
    completion and compare against its batch SQL oracle. Executes in
    this container since r07 via the vendored protobuf runtime
    (vendor/README.md); skips-with-reason only where no runtime can be
    found at all."""
    from go_map_reduce_spark.streaming.stateful import (
        _TWS_ORACLE,
        _protobuf_available,
        events_transform_with_state,
    )

    if not _protobuf_available():
        pytest.skip(
            "google.protobuf not importable: transformWithStateInPandas' "
            "Python runner cannot start in this container (SURVEY §11)"
        )
    compare(events_transform_with_state(spark, sf_dir), _TWS_ORACLE, sf_dir)
