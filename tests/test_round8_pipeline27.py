"""Round-8 capstone (pipeline27): the end-to-end curation funnel —
differential against the composed DuckDB oracle, the telescoping
reconciliation identity, and stage-level agreement (the funnel must
equal what the registered stage operators say when composed by hand)."""

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["curation_pipeline_e2e"](spark, sf_dir),
        ORACLES["curation_pipeline_e2e"],
        sf_dir,
    )


@pytest.fixture(scope="module")
def funnel(spark, sf_dir):
    return {
        r["split"]: r
        for r in QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect()
    }


def test_funnel_telescopes_exactly(spark, sf_dir, funnel):
    """The reconciliation identity the capstone exists to certify:
    per split, docs_in = gate_dropped + dedup_dropped + media_dropped
    + docs_kept (every document is attributed to exactly one outcome),
    and the split totals re-add to the corpus row count."""
    from go_map_reduce_spark.catalog import load_table

    assert funnel  # at least the train row exists
    for r in funnel.values():
        assert (
            r["docs_in"]
            == r["gate_dropped"] + r["dedup_dropped"] + r["media_dropped"]
            + r["docs_kept"]
        ), r
        assert 0 <= r["docs_cut"] <= r["docs_kept"]
        assert r["tokens_cut"] >= r["docs_cut"]  # each cut doc cut >=1 token
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["docs_in"] for r in funnel.values()) == n_docs


def test_funnel_agrees_with_composed_stages(spark, sf_dir, funnel):
    """Recompute the kept set by composing the registered stage
    operators directly; the funnel's docs_kept / tokens_kept /
    tokens_cut must match exactly, dedup_dropped must equal the
    gate-kept non-keepers, and media_dropped the gate+dedup-kept
    media non-survivors."""
    from go_map_reduce_spark.operators.pipeline23 import (
        doc_quality_composite_gate,
    )
    from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut
    from go_map_reduce_spark.operators.pipeline26 import (
        dedup_keep_best_quality,
        leakage_safe_split,
    )
    from go_map_reduce_spark.operators.pipeline35 import media_keep_decision

    media_ok = {
        r["doc_id"]: r["media_ok"]
        for r in media_keep_decision(spark, sf_dir).collect()
    }
    gate_keep = {
        r["doc_id"]
        for r in doc_quality_composite_gate(spark, sf_dir)
        .where("verdict = 'keep'")
        .collect()
    }
    not_keeper = {
        r["doc_id"]
        for r in dedup_keep_best_quality(spark, sf_dir)
        .where("NOT is_kept")
        .collect()
    }
    cut = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in substring_dup_cut(spark, sf_dir).collect()
    }
    split_of = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(spark, sf_dir).collect()
    }

    for sp, r in funnel.items():
        kept = [
            d
            for d, s in split_of.items()
            if s == sp
            and d in gate_keep
            and d not in not_keeper
            and media_ok[d]
        ]
        assert r["docs_kept"] == len(kept)
        assert r["dedup_dropped"] == sum(
            1 for d, s in split_of.items()
            if s == sp and d in gate_keep and d in not_keeper
        )
        assert r["media_dropped"] == sum(
            1 for d, s in split_of.items()
            if s == sp
            and d in gate_keep
            and d not in not_keeper
            and not media_ok[d]
        )
        assert r["tokens_cut"] == sum(cut[d][1] for d in kept)
        assert r["tokens_kept"] == sum(cut[d][0] - cut[d][1] for d in kept)


def test_packing_counts_are_feasible(spark, sf_dir, funnel):
    """Per split: 0 < n_sequences <= docs_kept (non-splitting packing
    puts each doc in exactly one sequence, possibly alone), and the
    volume bound n_sequences * PACK_BUDGET + oversize_excess >=
    tokens_kept (a sequence holds at most PACK_BUDGET tokens except
    the single-oversize-doc case, which contributes its excess)."""
    from go_map_reduce_spark.operators.pipeline23 import (
        doc_quality_composite_gate,
    )
    from go_map_reduce_spark.operators.pipeline25 import substring_dup_cut
    from go_map_reduce_spark.operators.pipeline26 import (
        dedup_keep_best_quality,
        leakage_safe_split,
    )
    from go_map_reduce_spark.operators.textstats import PACK_BUDGET

    from go_map_reduce_spark.operators.pipeline35 import media_keep_decision

    kept_tok = (
        leakage_safe_split(spark, sf_dir)
        .join(
            doc_quality_composite_gate(spark, sf_dir).where(
                "verdict = 'keep'"
            ).select("doc_id"),
            "doc_id",
        )
        .join(
            dedup_keep_best_quality(spark, sf_dir)
            .where("NOT is_kept")
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
        .join(
            media_keep_decision(spark, sf_dir)
            .where("media_ok")
            .select("doc_id"),
            "doc_id",
        )
        .join(
            substring_dup_cut(spark, sf_dir).select(
                "doc_id",
                (F.col("n_tokens") - F.col("n_removed")).alias("tok"),
            ),
            "doc_id",
        )
        .groupBy("split")
        .agg(
            F.sum(
                F.greatest(F.col("tok") - PACK_BUDGET, F.lit(0))
            ).alias("excess")
        )
        .collect()
    )
    excess = {r["split"]: r["excess"] for r in kept_tok}
    for sp, r in funnel.items():
        if r["docs_kept"] == 0:
            assert r["n_sequences"] == 0
            continue
        assert 0 < r["n_sequences"] <= r["docs_kept"]
        assert (
            r["n_sequences"] * PACK_BUDGET + excess.get(sp, 0)
            >= r["tokens_kept"]
        )
