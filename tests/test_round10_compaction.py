"""Round-10: acting on the upsert report — warm-start IVF compaction.

The oracle differential pins exact values; these pin the semantics:
the BEFORE phase reconciles cell-for-cell with the upsert report's
standing+new populations, vectors are conserved across phases, and the
warm start makes total distortion provably non-increasing."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["ivf_index_compaction"](spark, sf_dir),
        ORACLES["ivf_index_compaction"],
        sf_dir,
    )


def test_before_phase_reconciles_with_upsert_report(spark, sf_dir):
    """BEFORE is the upsert's world: every vector (standing + batch)
    assigned to the frozen standing centroids, so per cell
    n_vectors(before) == n_standing + n_new from ivf_index_upsert —
    the growth-permille reconciliation the r09 verdict asked for."""
    comp = QUERIES["ivf_index_compaction"](spark, sf_dir).collect()
    ups = QUERIES["ivf_index_upsert"](spark, sf_dir).collect()
    before = {
        r["cluster_id"]: r["n_vectors"] for r in comp if r["phase"] == "before"
    }
    expected = {r["cluster_id"]: r["n_standing"] + r["n_new"] for r in ups}
    assert before == {k: v for k, v in expected.items() if v > 0}


def test_vectors_conserved_and_distortion_non_increasing(spark, sf_dir):
    """Conservation: both phases partition the same population.
    Recovery direction: warm-start Lloyd weakly decreases total
    squared distortion (update = within-cell SSE minimizer, assign =
    per-vector nearest), so sum(n * mean_dist2) after <= before."""
    rows = QUERIES["ivf_index_compaction"](spark, sf_dir).collect()
    b = [r for r in rows if r["phase"] == "before"]
    a = [r for r in rows if r["phase"] == "after"]
    assert b and a
    n_total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in b) == n_total
    assert sum(r["n_vectors"] for r in a) == n_total
    tot_b = sum(r["n_vectors"] * r["mean_dist2"] for r in b)
    tot_a = sum(r["n_vectors"] * r["mean_dist2"] for r in a)
    # <= up to the 1e-9 per-cell rounding of mean_dist2
    assert tot_a <= tot_b + 1e-6 * len(a), (tot_a, tot_b)


def test_after_cells_are_subset_of_before_labels(spark, sf_dir):
    """Warm compaction preserves label continuity: it can empty a cell
    (drop-empty update) but never invents a new label."""
    rows = QUERIES["ivf_index_compaction"](spark, sf_dir).collect()
    before_ids = {r["cluster_id"] for r in rows if r["phase"] == "before"}
    after_ids = {r["cluster_id"] for r in rows if r["phase"] == "after"}
    assert after_ids <= before_ids
