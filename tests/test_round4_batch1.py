"""Round-4 batch 1: BM25 retrieval, KL divergence, chi-square,
interval-sweep concurrency — differential vs DuckDB plus semantic pins."""

import math

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "bm25_search_topk",
    "kl_divergence_by_lang",
    "chi2_lang_source",
    "max_concurrent_sessions",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = QUERIES["bm25_search_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_matches_pure_python(spark, sf_dir):
    """Replay BM25 in plain Python over the same corpus."""
    import duckdb

    from go_map_reduce_spark.operators.search import B, K1, QUERY_TERMS, TOP_K

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: t.split() for d, t in docs if t and t.split()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {
        q: sum(1 for t in toks.values() if q in t) for q in QUERY_TERMS
    }
    expected = {}
    for d, t in toks.items():
        s = 0.0
        for qterm in QUERY_TERMS:
            tf = t.count(qterm)
            if tf == 0:
                continue
            idf = round(
                math.log((n - dfreq[qterm] + 0.5) / (dfreq[qterm] + 0.5) + 1.0), 6
            )
            s += idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * (len(t) / avgdl))
            )
        if s > 0:
            expected[d] = s
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    got = [
        (r["doc_id"], r["bm25"])
        for r in QUERIES["bm25_search_topk"](spark, sf_dir).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (_, g), (_, e) in zip(got, top):
        assert g == pytest.approx(e, rel=1e-5)


def test_kl_nonnegative_and_en_smallest(spark, sf_dir):
    """KL ≥ 0 (Gibbs); the dominant language sits closest to the
    corpus distribution."""
    rows = {
        r["lang"]: r
        for r in QUERIES["kl_divergence_by_lang"](spark, sf_dir).collect()
    }
    assert set(rows) == {"en", "de", "fr", "es", "zh"}
    for r in rows.values():
        assert r["kl_vs_corpus"] >= -1e-9
        assert r["n_tokens"] > 0
    biggest = max(rows.values(), key=lambda r: r["n_tokens"])
    assert biggest["kl_vs_corpus"] == min(
        r["kl_vs_corpus"] for r in rows.values()
    )


def test_chi2_matches_scipy_formula(spark, sf_dir):
    """Chi-square statistic equals the closed-form computed in Python
    from the contingency table."""
    import duckdb

    row = QUERIES["chi2_lang_source"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    cells = con.sql(
        "SELECT lang, source, COUNT(*) FROM documents GROUP BY 1, 2"
    ).fetchall()
    rt, ct, total = {}, {}, 0
    for lang, src, c in cells:
        rt[lang] = rt.get(lang, 0) + c
        ct[src] = ct.get(src, 0) + c
        total += c
    chi2 = sum(
        (c - rt[lang] * ct[src] / total) ** 2 / (rt[lang] * ct[src] / total)
        for lang, src, c in cells
    )
    assert row["chi2"] == pytest.approx(chi2, rel=1e-6)
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert row["n_total"] == total


def test_max_concurrency_brute_force(spark, sf_dir):
    """The day-partitioned sweep equals a brute-force global sweep over
    session endpoints."""
    sessions = QUERIES["user_sessions"](spark, sf_dir).collect()
    pts = []
    for s in sessions:
        pts.append((s["session_start"], 1))
        pts.append((s["session_end"], -1))
    pts.sort(key=lambda p: (p[0], -p[1]))
    cur, best = 0, {}
    for t, d in pts:
        cur += d
        day = t.date()
        best[day] = max(best.get(day, 0), cur)
    # brute force covers days containing endpoints; fill interior days
    # of midnight-spanning sessions with their open-session count
    got = {
        r["day"].date(): r["max_concurrent"]
        for r in QUERIES["max_concurrent_sessions"](spark, sf_dir).collect()
    }
    for day, mx in best.items():
        assert got[day] >= mx  # carry-in can only add
    # exact equality where no session spans into the day
    for day, mx in best.items():
        if all(
            not (s["session_start"].date() < day <= s["session_end"].date())
            for s in sessions
        ):
            assert got[day] == mx
