"""Round-8 third batch (pipeline29): train-side decontamination cut
and the curation dataset card — DuckDB differentials, verdict
consistency, both-directions agreement with contamination_check, and
the card's exact reconciliation with the capstone funnel."""

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_decontamination_against_duckdb_oracle(spark, sf_dir):
    compare(QUERIES["decontamination_cut"](spark, sf_dir),
            ORACLES["decontamination_cut"], sf_dir)


def test_dataset_card_against_duckdb_oracle(spark, sf_dir):
    compare(QUERIES["curation_dataset_card"](spark, sf_dir),
            ORACLES["curation_dataset_card"], sf_dir)


def test_decontamination_verdicts_follow_the_threshold(spark, sf_dir):
    """Every verdict is exactly the threshold comparison on the
    emitted rate, no benchmark doc appears in the output, and rates
    are well-formed fractions of the emitted counts."""
    from go_map_reduce_spark.operators.dedup import HELDOUT_MOD
    from go_map_reduce_spark.operators.pipeline29 import DECON_DROP_RATE

    rows = QUERIES["decontamination_cut"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % HELDOUT_MOD != 0
        assert 0 <= r["n_benchmark_hits"] <= r["n_ngrams"]
        assert r["overlap_rate"] == r["n_benchmark_hits"] / r["n_ngrams"]
        assert r["verdict"] == (
            "drop" if r["overlap_rate"] >= DECON_DROP_RATE else "keep"
        )


def test_decontamination_hits_match_independent_recompute(spark, sf_dir):
    """A train doc has benchmark hits iff at least one of its
    shingles is shared with SOME held-out doc — recomputed from the
    shingle frame with a driver-side set, independent of the
    operator's join/agg shape."""
    from go_map_reduce_spark.operators.dedup import (
        HELDOUT_MOD,
        _spark_shingles,
    )

    sh = _spark_shingles(spark, sf_dir)
    bench_sh = {
        r["shingle"]
        for r in sh.where(F.col("doc_id") % HELDOUT_MOD == 0)
        .select("shingle").distinct().collect()
    }
    train_hits = {
        r["doc_id"]
        for r in sh.where(F.col("doc_id") % HELDOUT_MOD != 0)
        .where(F.col("shingle").isin(bench_sh) if bench_sh else F.lit(False))
        .select("doc_id").distinct().collect()
    }
    got = {
        r["doc_id"]: r["n_benchmark_hits"]
        for r in QUERIES["decontamination_cut"](spark, sf_dir).collect()
    }
    assert {d for d, h in got.items() if h > 0} == train_hits


def test_both_eval_hygiene_directions_audit_one_split(spark, sf_dir):
    """REAL cross-operator coupling, from the two registered queries'
    OUTPUTS (not a shared constant): contamination_check's scored
    docs and decontamination_cut's scored docs partition the corpus
    exactly (disjoint, union = all documents), and the two directions
    agree on whether any vocabulary is shared across the boundary —
    if either side sees an overlap, both must."""
    from go_map_reduce_spark.catalog import load_table

    test_side = {
        r["doc_id"]: r["n_overlap"]
        for r in QUERIES["contamination_check"](spark, sf_dir).collect()
    }
    train_side = {
        r["doc_id"]: r["n_benchmark_hits"]
        for r in QUERIES["decontamination_cut"](spark, sf_dir).collect()
    }
    all_docs = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id").collect()
    }
    assert set(test_side).isdisjoint(train_side)
    assert set(test_side) | set(train_side) == all_docs
    assert (any(v > 0 for v in test_side.values())
            == any(v > 0 for v in train_side.values()))


def test_dataset_card_reconciles_with_the_funnel(spark, sf_dir):
    """Cross-operator reconciliation: per split, the card's token and
    document totals must equal the capstone funnel's tokens_kept /
    docs_kept EXACTLY (same decision frame, different grouping), and
    token shares must sum to 1 per split."""
    funnel = {
        r["split"]: r
        for r in QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect()
    }
    card = QUERIES["curation_dataset_card"](spark, sf_dir).collect()
    by_split = {}
    for r in card:
        agg = by_split.setdefault(
            r["split"], {"docs": 0, "toks": 0, "share": 0.0}
        )
        agg["docs"] += r["n_docs"]
        agg["toks"] += r["tokens_kept"]
        agg["share"] += r["token_share"]
    for sp, agg in by_split.items():
        assert agg["docs"] == funnel[sp]["docs_kept"], (sp, agg)
        assert agg["toks"] == funnel[sp]["tokens_kept"], (sp, agg)
        assert abs(agg["share"] - 1.0) < 1e-4, (sp, agg)
    # every split with kept docs has card rows
    for sp, r in funnel.items():
        assert (sp in by_split) == (r["docs_kept"] > 0)


def test_dataset_card_scan_is_column_pruned(spark, sf_dir):
    """The provenance join must read EXACTLY (doc_id, source) from
    its documents scan — asserted as an exact field-set match on a
    ReadSchema, so the test cannot pass vacuously off some other
    stage's scan if the provenance scan ever regresses to dragging
    text along."""
    import re

    plan = (
        QUERIES["curation_dataset_card"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    schemas = [
        {f.split(":")[0] for f in s.split(",") if f}
        for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    assert {"doc_id", "source"} in schemas, schemas
    # and no scan reads source together with text (the only source
    # consumer is the pruned provenance scan)
    assert not any(
        "source" in s and "text" in s for s in schemas
    ), schemas


def test_ann_recall_against_duckdb_oracle(spark, sf_dir):
    compare(QUERIES["ann_recall_eval"](spark, sf_dir),
            ORACLES["ann_recall_eval"], sf_dir)


def test_ann_recall_matches_driver_side_recompute(spark, sf_dir):
    """Independent recompute: build each method's top-k and the
    brute-force truth as driver-side sets from the REGISTERED queries
    and re-derive every (n_truth, n_hits, recall) cell."""
    from go_map_reduce_spark.operators.kmeans import (
        IVF_TOP_K,
        N_IVF_QUERIES,
        ivf_probe_topk,
    )
    from go_map_reduce_spark.operators.similarity import (
        BUCKET_TOP_K,
        N_QUERY_VECS,
        PQ_N_QUERY,
        TOP_K,
        ann_bruteforce_topk,
        ann_lsh_topk,
        pq_ann_topk,
    )

    from go_map_reduce_spark.operators.similarity import PQ_TOP_K

    def pairs(df, k, nq, pool_min=None):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.collect()
            if r["rk"] <= k and r["query_id"] < nq
            and (pool_min is None or r["neighbor_id"] >= pool_min)
        }

    brute = ann_bruteforce_topk(spark, sf_dir)
    # (frame, k, n_queries, truth pool floor) — pq's truth restricts
    # to its reachable pool, mirroring _ann_methods
    spec = {
        "lsh_bucket": (ann_lsh_topk(spark, sf_dir), BUCKET_TOP_K,
                       N_QUERY_VECS, None),
        "ivf_probe": (ivf_probe_topk(spark, sf_dir), IVF_TOP_K,
                      N_IVF_QUERIES, None),
        "pq_adc": (pq_ann_topk(spark, sf_dir), min(TOP_K, PQ_TOP_K),
                   PQ_N_QUERY, PQ_N_QUERY),
    }
    got = {
        r["method"]: r
        for r in QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    }
    assert set(got) == set(spec)
    for method, (df, k, nq, pool_min) in spec.items():
        truth = pairs(brute, k, nq, pool_min)
        approx = pairs(df, k, nq)
        r = got[method]
        assert r["k"] == k
        assert r["n_truth"] == len(truth), (method, r)
        assert r["n_hits"] == len(approx & truth), (method, r)
        assert 0 <= r["n_hits"] <= r["n_truth"]
        # the loud empty-truth guard (_recall_row emits NULL on an
        # empty pool in both engines; a NULL here means the pool
        # restriction broke — fail with the full row)
        assert r["n_truth"] > 0 and r["recall"] is not None, (method, r)
        assert r["recall"] == r["n_hits"] / r["n_truth"], r


def test_ann_recall_every_tier_usable(spark, sf_dir):
    """The r08 verdict's acceptance bar for the r09 retune: every
    registered approximate tier holds recall@k >= 0.5 against the
    brute-force truth (IVF was already 0.92; multi-probe centered
    sign-LSH and the trained+reranked PQ were tuned to clear it —
    measured 0.67 / 0.73 at sf0.01, PERFORMANCE.md r09)."""
    rows = QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["recall"] >= 0.5, (r["method"], r["recall"])
