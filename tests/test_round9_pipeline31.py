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
        if r["n_standing"] == 0:
            # full-outer guarantee: a batch-only cell surfaces instead
            # of silently dropping; growth is undefined there
            assert r["n_new"] > 0 and r["growth_permille"] is None, r
            assert r["mean_dist2_standing"] is None, r
        else:
            assert (
                r["growth_permille"]
                == (r["n_new"] * 1000) // r["n_standing"]
            )
            assert r["mean_dist2_standing"] >= 0
        if r["n_new"] == 0:
            assert r["mean_dist2_new"] is None, r
        else:
            assert r["mean_dist2_new"] >= 0, r


def _numpy_lloyd_frozen(sf_dir):
    """Independent replay of the upsert's training in numpy: first-K
    (lowest standing vec_id) init, ITERATIONS Lloyd rounds with the
    (dist2, cid) tie rule and drop-empty updates, returning the FROZEN
    centroids c_{ITERATIONS-1} (the set the final standing assignment
    uses — the same convention kmeans_ivf_assignments stores), their
    cid labels, and the standing/batch vector arrays."""
    import numpy as np
    import pyarrow.parquet as pq

    from go_map_reduce_spark.operators.kmeans import ITERATIONS

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vid = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    is_new = (vid % NEW_BATCH_MOD) == NEW_BATCH_REM
    Xs, Xb = X[~is_new], X[is_new]
    vs = vid[~is_new]
    init_ids = np.sort(vs)[:K]
    C = np.stack([Xs[vs == i][0] for i in init_ids])
    cids = list(range(K))  # row i of C carries cid label cids[i]
    for it in range(1, ITERATIONS + 1):
        d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # argmin takes the FIRST minimum; rows are in ascending-cid
        # order, so this replays the (dist2, cid) tie rule
        a = d2.argmin(axis=1)
        if it < ITERATIONS:
            keep = [i for i in range(C.shape[0]) if (a == i).any()]
            C = np.stack([Xs[a == i].mean(axis=0) for i in keep])
            cids = [cids[i] for i in keep]
    return C, cids, Xs, Xb


def test_upsert_batch_lands_in_nearest_frozen_cell(spark, sf_dir):
    """Independent numpy replay of the admit semantics: recompute the
    frozen centroids (full Lloyd replay, NOT reading anything back
    from the operator), brute-force every batch vector's nearest
    frozen centroid, and pin that the report's per-cell n_new matches
    the replay exactly — a refactor that quietly retrains on the
    batch, or measures it against once-more-updated centroids, moves
    these counts and fails here even though the DuckDB differential
    (which replays whatever the Spark side does) cannot see it."""
    import numpy as np

    C, cids, Xs, Xb = _numpy_lloyd_frozen(sf_dir)
    d2b = ((Xb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    batch_cells = [cids[i] for i in d2b.argmin(axis=1)]
    expected = {c: batch_cells.count(c) for c in set(batch_cells)}

    rows = QUERIES["ivf_index_upsert"](spark, sf_dir).collect()
    reported = {r["cluster_id"]: r["n_new"] for r in rows}
    # every replayed landing cell is reported with the exact count...
    for cell, n in expected.items():
        assert reported.get(cell) == n, (cell, n, reported)
    # ...and no reported cell claims batch mass the replay didn't put
    # there (conservation: total admitted == batch size)
    assert sum(reported.values()) == len(Xb) == sum(expected.values())
    assert all(0 <= r["cluster_id"] < K for r in rows)
    # the standing-side distortion must also be measured against the
    # SAME frozen centroids (the ADVICE r09 bias fix): replay it
    d2s = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a_s = d2s.argmin(axis=1)
    for i, cid in enumerate(cids):
        m = a_s == i
        if not m.any():
            continue
        want = d2s[m, i].mean()
        got = next(
            r["mean_dist2_standing"]
            for r in rows
            if r["cluster_id"] == cid and r["n_standing"] > 0
        )
        assert got == pytest.approx(want, rel=1e-9), (cid, got, want)


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
