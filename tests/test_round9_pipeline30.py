"""Round-9: the incremental daily-batch capstone and the drift report.

The invariants here are the r08 verdict's acceptance criteria for the
incremental composition: telescoping funnel identity, NO double-admit
(an admitted batch doc is never a verified near-dup of any standing
document), NO leakage straddle (admitted docs share their cluster's
split side with every near-dup, standing or batch), and the EXACT
standing-plus-admitted reconciliation against the full-corpus funnel —
plus the drift report's self-consistency (drift of a run against
itself is identically zero)."""

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["curation_incremental_admit", "curation_drift_report"]


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_incremental_funnel_telescopes(spark, sf_dir):
    """docs_in = gate_dropped + dedup_dropped + media_dropped +
    docs_kept per split, and every count is within the batch's
    bounds."""
    rows = QUERIES["curation_incremental_admit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["docs_in"]
            == r["gate_dropped"] + r["dedup_dropped"] + r["media_dropped"]
            + r["docs_kept"]
        ), r
        assert 0 <= r["docs_cut"] <= r["docs_kept"]
        assert 0 <= r["index_matched"] <= r["docs_in"]


def _decisions(spark, sf_dir):
    from go_map_reduce_spark.operators.pipeline30 import _batch_decisions

    return {r["doc_id"]: r for r in _batch_decisions(spark, sf_dir).collect()}


def _verified_pairs(spark, sf_dir):
    from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs

    return [
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    ]


def test_no_double_admit_and_no_straddle(spark, sf_dir):
    """An admitted batch doc has NO verified near-dup pair into the
    standing index (double-admit) and NO pair crossing the train/val
    boundary in either direction (leakage straddle) — both must be
    zero BY CONSTRUCTION: admission requires an index-free cluster,
    pairs are cluster edges, and the split is cluster-keyed."""
    from go_map_reduce_spark.operators.pipeline20 import (
        NEW_BATCH_MOD,
        NEW_BATCH_REM,
    )
    from go_map_reduce_spark.operators.pipeline26 import leakage_safe_split

    dec = _decisions(spark, sf_dir)
    admitted = {d for d, r in dec.items() if r["gate_ok"] and r["admit_ok"]}
    assert admitted, "degenerate test: nothing admitted"
    split = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(spark, sf_dir).collect()
    }
    double_admit = straddle = 0
    for a, b in _verified_pairs(spark, sf_dir):
        for x, y in ((a, b), (b, a)):
            if x in admitted:
                if y % NEW_BATCH_MOD != NEW_BATCH_REM:
                    double_admit += 1
                if split[x] != split[y]:
                    straddle += 1
    assert double_admit == 0
    assert straddle == 0


def test_direct_match_implies_cluster_has_index(spark, sf_dir):
    """Pair-universe alignment: a direct new⋈index verified match
    (pipeline20's band join) is an edge of the cluster graph, so the
    matched doc's cluster must contain an index member."""
    dec = _decisions(spark, sf_dir)
    matched = [d for d, r in dec.items() if r["direct_match"]]
    assert matched, "degenerate test: no direct index matches at this sf"
    for d in matched:
        assert dec[d]["has_index"], d


def test_standing_plus_admitted_reconciles_with_full_funnel(spark, sf_dir):
    """EXACT reconciliation: the full-corpus funnel's kept set equals
    standing-kept (kept ∩ index) ∪ admitted ∪ {batch keepers of
    mixed clusters} — the last term is precisely the keeper-identity
    divergence an incremental run accepts (it rejects new content the
    index already represents even when the new copy would win
    keep-best), and nothing else may differ."""
    from go_map_reduce_spark.operators.pipeline20 import (
        NEW_BATCH_MOD,
        NEW_BATCH_REM,
    )
    from go_map_reduce_spark.operators.pipeline27 import staged_decisions

    dec = _decisions(spark, sf_dir)
    full = {
        r["doc_id"]: r for r in staged_decisions(spark, sf_dir).collect()
    }
    full_kept = {
        d
        for d, r in full.items()
        if r["gate_ok"] and r["dedup_ok"] and r["media_ok"]
    }
    is_batch = lambda d: d % NEW_BATCH_MOD == NEW_BATCH_REM  # noqa: E731
    standing_kept = {d for d in full_kept if not is_batch(d)}
    admitted = {
        d
        for d, r in dec.items()
        if r["gate_ok"] and r["admit_ok"] and r["media_ok"]
    }
    mixed_batch_keepers = {
        d for d in full_kept if is_batch(d) and dec[d]["has_index"]
    }
    assert admitted == (full_kept - standing_kept) - mixed_batch_keepers
    assert standing_kept | admitted == full_kept - mixed_batch_keepers
    # and the admitted token accounting matches the registered rows
    got = {
        r["split"]: r
        for r in QUERIES["curation_incremental_admit"](spark, sf_dir).collect()
    }
    for s, r in got.items():
        docs = [d for d in admitted if dec[d]["split"] == s]
        assert r["docs_kept"] == len(docs)
        assert r["tokens_kept"] == sum(
            dec[d]["n_tokens"] - dec[d]["n_removed"] for d in docs
        )


@pytest.fixture(scope="module")
def staged_bucketed(spark, sf_dir):
    from go_map_reduce_spark.operators.pipeline30 import write_staged_bucketed

    write_staged_bucketed(spark, sf_dir, prefix="t9staged")
    yield "t9staged"
    for t in ("gate", "cut", "keep", "split", "media"):
        spark.sql(f"DROP TABLE IF EXISTS t9staged_{t}")


def test_bucketed_staged_joins_have_zero_exchange(spark, staged_bucketed):
    """The r08 verdict's task-4 plan pin: with the five decision
    frames written doc_id-bucketed, recomposing staged_decisions is
    sort-merge joins with NO Exchange anywhere in the plan."""
    from go_map_reduce_spark.operators.pipeline30 import (
        staged_decisions_bucketed,
    )

    df = staged_decisions_bucketed(spark, prefix=staged_bucketed)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_staged_equals_direct(spark, sf_dir, staged_bucketed):
    """The exchange-free composition reads back the IDENTICAL decision
    frame the capstone computes directly."""
    from go_map_reduce_spark.operators.pipeline27 import staged_decisions
    from go_map_reduce_spark.operators.pipeline30 import (
        staged_decisions_bucketed,
    )

    key = lambda r: r["doc_id"]  # noqa: E731
    direct = sorted(staged_decisions(spark, sf_dir).collect(), key=key)
    bucketed = sorted(
        staged_decisions_bucketed(spark, prefix=staged_bucketed).collect(),
        key=key,
    )
    assert [r.asDict() for r in bucketed] == [r.asDict() for r in direct]


def test_self_drift_is_identically_zero(spark, sf_dir):
    """The drift of a funnel against ITSELF (gate_b == gate_a) is zero
    on every (split, metric) cell — the report's calibration."""
    from go_map_reduce_spark.operators.pipeline27 import staged_decisions
    from go_map_reduce_spark.operators.pipeline30 import _drift_frame

    staged = staged_decisions(spark, sf_dir)
    rows = _drift_frame(staged, F.col("gate_ok"), F.col("gate_ok")).collect()
    assert rows
    for r in rows:
        assert r["delta"] == 0 and r["a_value"] == r["b_value"], r


def test_drift_report_attribution_shape(spark, sf_dir):
    """Revision B only tightens the gate, so per split: docs_in delta
    is exactly zero (same corpus), gate_dropped can only grow,
    docs_kept/tokens_kept can only shrink, and the doc-count deltas
    balance (docs_in = gate_dropped + dedup_dropped + docs_kept in
    both revisions ⇒ their deltas sum to zero)."""
    rows = QUERIES["curation_drift_report"](spark, sf_dir).collect()
    by_split: dict = {}
    for r in rows:
        by_split.setdefault(r["split"], {})[r["metric"]] = r
    assert by_split
    for s, m in by_split.items():
        assert set(m) == {
            "docs_in",
            "gate_dropped",
            "dedup_dropped",
            "media_dropped",
            "docs_kept",
            "docs_cut",
            "tokens_cut",
            "tokens_kept",
        }
        assert m["docs_in"]["delta"] == 0, s
        assert m["gate_dropped"]["delta"] >= 0, s
        assert m["docs_kept"]["delta"] <= 0, s
        assert m["tokens_kept"]["delta"] <= 0, s
        assert (
            m["gate_dropped"]["delta"]
            + m["dedup_dropped"]["delta"]
            + m["media_dropped"]["delta"]
            + m["docs_kept"]["delta"]
            == 0
        ), s
    # the modelled retune must actually move something somewhere
    assert any(
        m["gate_dropped"]["delta"] > 0 for m in by_split.values()
    ), "DRIFT_MIN_TOKENS retune moved nothing — revision B degenerate"
