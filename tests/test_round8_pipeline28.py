"""Round-8 second batch (pipeline28): the queryable leakage audit and
deterministic span-corruption prep — DuckDB differentials, an
independent sequential-Python mask reference, the audit's zero-cross
guarantee, and the no-shuffle plan pin for the mask projection."""

import hashlib

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_leakage_audit_against_duckdb_oracle(spark, sf_dir):
    compare(QUERIES["leakage_audit"](spark, sf_dir),
            ORACLES["leakage_audit"], sf_dir)


def test_span_corruption_against_duckdb_oracle(spark, sf_dir):
    compare(QUERIES["span_corruption_masks"](spark, sf_dir),
            ORACLES["span_corruption_masks"], sf_dir)


@pytest.fixture(scope="module")
def audit(spark, sf_dir):
    return {
        (r["policy"], r["split_a"], r["split_b"]): r["n_pairs"]
        for r in QUERIES["leakage_audit"](spark, sf_dir).collect()
    }


def test_audit_emits_all_six_cells(audit):
    assert len(audit) == 6
    assert all(v >= 0 for v in audit.values())


def test_audit_cluster_policy_has_zero_cross_split_pairs(audit):
    """The audit's reason to exist: the cluster-keyed split's
    (train, val) cell is exactly 0, while the corpus genuinely has
    verified pairs (within-split mass nonzero)."""
    assert audit[("cluster_split", "train", "val")] == 0
    total = sum(v for (p, _, _), v in audit.items() if p == "cluster_split")
    assert total > 0


def test_audit_policies_count_the_same_pair_universe(audit):
    """Both policies label the SAME verified-pair frame, so their six
    cells sum to the same total; and the doc-hash policy's cross cell
    carries the straddling mass the cluster key prevented (asserted
    only when the pair count makes zero straddles implausible —
    each pair straddles with p ~ 0.18, 0.82^20 < 2%)."""
    c = sum(v for (p, _, _), v in audit.items() if p == "cluster_split")
    n = sum(v for (p, _, _), v in audit.items() if p == "doc_hash_split")
    assert c == n
    if n >= 20:
        assert audit[("doc_hash_split", "train", "val")] > 0


def _python_mask_reference(doc_id: int, n_tokens: int):
    """Sequential reference: the md5 convention straight from the
    operator's contract, no Spark, no DuckDB."""
    from go_map_reduce_spark.operators.pipeline28 import (
        SPAN_LEN,
        SPAN_START_PERMILLE,
    )

    starts = [
        int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:4], 16) % 1000
        < SPAN_START_PERMILLE
        for i in range(1, n_tokens + 1)
    ]
    masked = [
        any(starts[max(0, i - SPAN_LEN + 1): i + 1])
        for i in range(n_tokens)
    ]
    n_masked = sum(masked)
    n_spans = sum(
        1 for i in range(n_tokens) if masked[i] and (i == 0 or not masked[i - 1])
    )
    return n_masked, n_spans


def test_span_corruption_matches_sequential_python(spark, sf_dir):
    """Every doc's (n_masked, n_spans) must equal the sequential
    Python replay of the md5 contract — independent of BOTH engines,
    so a shared SQL-dialect quirk can't hide in the differential."""
    rows = QUERIES["span_corruption_masks"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n_masked, n_spans = _python_mask_reference(r["doc_id"], r["n_tokens"])
        assert (r["n_masked"], r["n_spans"]) == (n_masked, n_spans), r
        assert r["input_len"] == r["n_tokens"] - n_masked + n_spans
        assert r["target_len"] == n_masked + n_spans


def test_span_corruption_plan_has_no_exchange(spark, sf_dir):
    """The 100 TB claim, pinned: the whole computation is a narrow
    per-row projection over the scan — the physical plan contains no
    Exchange (and no generate/explode to token-level rows)."""
    plan = (
        QUERIES["span_corruption_masks"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_span_corruption_rate_tracks_the_permille(spark, sf_dir):
    """Corpus-level sanity: with start probability p = permille/1000
    and span length L, expected corruption is 1 - (1-p)^L (~14.3% at
    p=.05, L=3); the corpus-weighted rate must land within a loose
    band of it, and every doc's rate within [0, 1]."""
    from go_map_reduce_spark.operators.pipeline28 import (
        SPAN_LEN,
        SPAN_START_PERMILLE,
    )

    agg = (
        QUERIES["span_corruption_masks"](spark, sf_dir)
        .agg(
            F.sum("n_masked").alias("m"),
            F.sum("n_tokens").alias("t"),
            F.min("corruption_rate").alias("lo"),
            F.max("corruption_rate").alias("hi"),
        )
        .collect()[0]
    )
    assert 0.0 <= agg["lo"] and agg["hi"] <= 1.0
    p = SPAN_START_PERMILLE / 1000
    expect = 1 - (1 - p) ** SPAN_LEN
    assert agg["t"] > 0
    rate = agg["m"] / agg["t"]
    assert abs(rate - expect) < 0.05, (rate, expect)
