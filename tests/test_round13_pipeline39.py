"""Round-13 mixture planning: oracle differential + the flattening
semantics the oracle can't express (temperature direction, epoch
accounting, conservation)."""

import math

from go_map_reduce_spark.operators.pipeline39 import EPOCH_CAP, TARGET_MULT
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_mixture_plan_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["source_mixture_plan"](spark, sf_dir),
        ORACLES["source_mixture_plan"],
        sf_dir,
    )


def test_shares_conserve_and_flattening_direction(spark, sf_dir):
    """Both share columns sum to 1 (6dp rounding tolerance); the
    temperature share FLATTENS — above-average sources lose share,
    below-average gain — and strictly preserves the token-mass order
    (sqrt is monotone)."""
    out = QUERIES["source_mixture_plan"](spark, sf_dir).toPandas()
    n = len(out)
    assert n > 1
    assert abs(out["nat_share"].sum() - 1.0) <= n * 1e-6
    assert abs(out["temp_share"].sum() - 1.0) <= n * 1e-6

    # the nat/temp crossover sits at t* = (total/wsum)^2 (solve
    # sqrt(t)/wsum == t/total), NOT at the mean token mass
    total = out["tokens_kept"].sum()
    wsum = sum(math.sqrt(t) for t in out["tokens_kept"])
    pivot = (total / wsum) ** 2
    big = out[out["tokens_kept"] > pivot]
    small = out[out["tokens_kept"] < pivot]
    assert len(big) and len(small)
    assert (big["temp_share"] <= big["nat_share"] + 1e-6).all()
    assert (small["temp_share"] >= small["nat_share"] - 1e-6).all()

    by_tok = out.sort_values("tokens_kept")
    assert by_tok["temp_share"].is_monotonic_increasing


def test_epoch_accounting_recomputed(spark, sf_dir):
    """planned_epochs recomputed independently: target tokens
    allocated by temp share, divided by the source's own mass; the
    epoch-weighted token masses sum back to the target; over_cap
    matches the recomputation."""
    out = QUERIES["source_mixture_plan"](spark, sf_dir).toPandas()
    total = int(out["tokens_kept"].sum())
    wsum = sum(math.sqrt(t) for t in out["tokens_kept"])
    for _, r in out.iterrows():
        share = math.sqrt(r["tokens_kept"]) / wsum
        epochs = TARGET_MULT * total * share / r["tokens_kept"]
        assert abs(r["planned_epochs"] - epochs) <= 1e-5
        assert bool(r["over_cap"]) == (epochs > EPOCH_CAP)
    replayed = (out["planned_epochs"] * out["tokens_kept"]).sum()
    assert abs(replayed - TARGET_MULT * total) <= total * 1e-4


def test_cut_provenance_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["crossmodal_cut_provenance"](spark, sf_dir),
        ORACLES["crossmodal_cut_provenance"],
        sf_dir,
    )


def test_every_cut_doc_has_an_edge_and_reconciles(spark, sf_dir):
    """Membership implies evidence: every cut doc has >= 1 tier
    linked (isolated docs are singletons by construction); the rows
    reconcile with the capstone — per cluster, cut rows == n_docs - 1
    and the survivor column matches; all four tiers appear as the
    sole link for SOME doc (each evidence type is load-bearing)."""
    out = QUERIES["crossmodal_cut_provenance"](spark, sf_dir).toPandas()
    flags = out[["text_linked", "img_linked", "aud_linked", "vid_linked"]]
    assert flags.any(axis=1).all(), "cut doc with no attaching evidence"

    cap = QUERIES["crossmodal_dedup_survivors"](spark, sf_dir).toPandas()
    multi = cap[cap["n_docs"] > 1]
    per_cluster = out.groupby("cluster_id").size()
    assert per_cluster.sum() == int((multi["n_docs"] - 1).sum())
    j = out.merge(
        cap[["cluster_id", "survivor_doc_id"]],
        on="cluster_id",
        suffixes=("", "_cap"),
    )
    assert (j["survivor_doc_id"] == j["survivor_doc_id_cap"]).all()
    assert not out.merge(
        cap[["survivor_doc_id"]], left_on="doc_id",
        right_on="survivor_doc_id", how="inner",
    ).shape[0], "a survivor appears as a cut doc"

    only = flags.sum(axis=1) == 1
    for col in flags.columns:
        assert (flags[only][col]).any(), f"{col} never the sole evidence"
