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
    from go_map_reduce_spark.operators.pipeline29 import (
        DECON_BENCH_MOD,
        DECON_DROP_RATE,
    )

    rows = QUERIES["decontamination_cut"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % DECON_BENCH_MOD != 0
        assert 0 <= r["n_benchmark_hits"] <= r["n_ngrams"]
        assert r["overlap_rate"] == r["n_benchmark_hits"] / r["n_ngrams"]
        assert r["verdict"] == (
            "drop" if r["overlap_rate"] >= DECON_DROP_RATE else "keep"
        )


def test_decontamination_agrees_with_contamination_check(spark, sf_dir):
    """The two directions share one overlap definition: a train doc
    has benchmark hits iff at least one of its shingles is shared
    with SOME held-out doc — cross-checked by recomputing the shared
    shingle vocabulary from contamination_check's own building block
    (the registered shingle frame) and comparing the hit sets."""
    from go_map_reduce_spark.operators.dedup import _spark_shingles
    from go_map_reduce_spark.operators.pipeline29 import DECON_BENCH_MOD

    sh = _spark_shingles(spark, sf_dir)
    bench_sh = {
        r["shingle"]
        for r in sh.where(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .select("shingle").distinct().collect()
    }
    train_hits = {
        r["doc_id"]
        for r in sh.where(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .where(F.col("shingle").isin(bench_sh) if bench_sh else F.lit(False))
        .select("doc_id").distinct().collect()
    }
    got = {
        r["doc_id"]: r["n_benchmark_hits"]
        for r in QUERIES["decontamination_cut"](spark, sf_dir).collect()
    }
    assert {d for d, h in got.items() if h > 0} == train_hits


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
    """The provenance join must read only (doc_id, source) from its
    documents scan — the card's own scan may not drag text along.
    At least one scan with a pruned ReadSchema must exist and no scan
    may read text WITHOUT the cut stage needing it (the staged frame
    legitimately reads text once for tokenize/cut)."""
    plan = (
        QUERIES["curation_dataset_card"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "doc_id" in plan
    # the pruned provenance scan: a ReadSchema containing source but
    # not text
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any("source" in s and "text" not in s for s in schemas), schemas
