"""Differential tests for the dedup operator suite."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

DEDUP = [
    "dedup_exact_summary",
    "dedup_exact_survivors",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash_fingerprints",
    "embedding_near_dup_pairs",
    "ngram_jaccard_pairs",
    "lsh_bucket_stats",
    "lsh_template_clusters",
    "contamination_check",
]


def test_contamination_bounds(spark, sf_dir):
    """Structural invariants: only test-split docs appear, overlap never
    exceeds the n-gram count, rate is the exact quotient."""
    rows = QUERIES["contamination_check"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 10 == 0
        assert 0 <= r["n_overlap"] <= r["n_ngrams"]
        assert r["contamination_rate"] == r["n_overlap"] / r["n_ngrams"]


@pytest.mark.parametrize("name", DEDUP)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_exact_jaccard_supersets_minhash(spark):
    """Prefix-filtered exact Jaccard has zero false negatives, so every
    pair MinHash banding surfaces (a probabilistic subset) must also be
    found by the exact join, with the identical verified score."""
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["ngram_jaccard_pairs"](spark, sf).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["minhash_near_dup_pairs"](spark, sf).collect()
    }
    assert set(approx) <= set(exact)
    assert all(exact[p] == approx[p] for p in approx)


def test_minhash_finds_near_dups_at_sf001(spark):
    """The sf0.01 corpus contains prefix-sharing near-duplicates; the
    minhash pipeline must surface at least one verified pair there."""
    df = QUERIES["minhash_near_dup_pairs"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in rows)
    assert len(rows) > 0


def test_simhash64_matches_spec(spark):
    """Engine-vs-spec differential for the 64-bit SimHash (DuckDB has no
    xxhash64, so the oracle is a pure-Python XXH64 from the public
    specification): recompute every doc's fingerprint in Python and
    compare bit-for-bit."""
    import re

    import duckdb

    from tests.xxh64_ref import xxh64

    sf = "/root/testdata/sf0.01"
    got = {
        r["doc_id"]: (r["simhash64"], r["n_tokens"])
        for r in QUERIES["simhash64_fingerprints"](spark, sf).collect()
    }
    docs = duckdb.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    assert len(got) == len(docs)
    for doc_id, text in docs:
        tokens = [t for t in re.split(r"[^A-Za-z]+", text) if t]
        votes = [0] * 64
        for t in tokens:
            h = xxh64(t.encode()) & ((1 << 64) - 1)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        fp = sum(1 << i for i in range(64) if votes[i] > 0)
        assert got[doc_id] == (f"{fp:016x}", len(tokens)), doc_id


def test_simhash64_collision_behavior(spark):
    """A healthy 64-bit fingerprint: identical token streams collide
    exactly, distinct docs essentially never do, and unrelated-pair
    hamming distances are well away from 0. (Same-language docs share
    vocabulary, so the mean sits below the 32-bit binomial midpoint —
    ~18 on this corpus — which is expected SimHash behavior, not a
    defect.)"""
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["simhash64_fingerprints"](spark, sf).collect()
    fps = [int(r["simhash64"], 16) for r in rows]
    dists = [
        bin(fps[i] ^ fps[i + len(fps) // 2]).count("1")
        for i in range(len(fps) // 2)
    ]
    assert 8 <= sum(dists) / len(dists) <= 40
    # collisions are rare and confined to near-duplicate families (the
    # corpus has ~25 high-Jaccard pairs — colliding on those is the
    # intended SimHash behavior, not a hash defect)
    assert len(set(fps)) >= len(fps) - 10


def test_degenerate_bucket_cap(spark):
    """A boilerplate corpus (1000 docs sharing every band key) must NOT
    go quadratic: the capped pair join emits no pairs for the over-cap
    bucket, and the template-cluster side output captures it instead."""
    from go_map_reduce_spark.operators.dedup import (
        BANDS,
        _docsets_from_docs,
        _near_dup_pairs_from_docsets,
        _template_clusters_from_docsets,
    )

    template = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, template) for i in range(1000)] + [(2000, "something else entirely")],
        schema="doc_id bigint, text string",
    )
    docsets = _docsets_from_docs(docs).persist()
    try:
        # capped: the 1000-doc bucket is excluded → no pairwise explosion
        pairs = _near_dup_pairs_from_docsets(docsets, cap=64).collect()
        assert pairs == []
        clusters = _template_clusters_from_docsets(docsets, cap=64).collect()
        # every band has the same degenerate membership
        assert len(clusters) == BANDS
        assert all(c["n_docs"] == 1000 and c["keep_doc_id"] == 0 for c in clusters)
        # sanity: with a cap that admits the bucket, pairs DO appear
        some = _near_dup_pairs_from_docsets(docsets.where("doc_id < 3"), cap=64)
        assert some.count() == 3  # 3 identical docs → 3 pairs, jaccard 1.0
    finally:
        docsets.unpersist()
