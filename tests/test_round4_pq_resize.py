"""Round-4: product-quantization ANN and the BMP resize tier."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["pq_ann_topk", "multimodal_image_resize"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def _load_vectors(sf_dir):
    import duckdb

    con = duckdb.connect()
    return dict(
        con.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )


def test_pq_matches_python_replay(spark, sf_dir):
    """The whole trained-PQ pipeline (per-subspace Lloyd training →
    encode → ADC shortlist → exact cosine rerank) is deterministic;
    Spark's result must equal a pure-Python replay, id for id.  The
    replay mirrors the registered semantics exactly: first-K init,
    (distance, cid) argmin ties, drop-empty-cluster updates, ADC over
    the final codebook, shortlist by (adc, id), rerank by exact
    cosine (desc, id).  Float sums here vs decimal sums in the
    engines agree far beyond the distance gaps in this data."""
    import math

    from go_map_reduce_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_N_QUERY,
        PQ_RERANK,
        PQ_SUBDIM,
        PQ_TOP_K,
    )

    vecs = _load_vectors(sf_dir)

    def subv(v, m):
        return v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    corpus = {i: v for i, v in vecs.items() if i >= PQ_N_QUERY}
    cids = sorted(corpus)
    # train per-subspace: init = first K corpus subvectors, keyed by
    # cid = vec_id - PQ_N_QUERY; empty clusters drop from the update
    cb = [
        {
            i - PQ_N_QUERY: list(subv(corpus[i], m))
            for i in cids[:PQ_K]
        }
        for m in range(PQ_M)
    ]
    for _ in range(PQ_ITERS):
        for m in range(PQ_M):
            assign = {
                i: min(cb[m], key=lambda c: (d2(subv(corpus[i], m), cb[m][c]), c))
                for i in cids
            }
            new = {}
            for c in sorted(set(assign.values())):
                members = [subv(corpus[i], m) for i in cids if assign[i] == c]
                new[c] = [
                    sum(v[j] for v in members) / len(members)
                    for j in range(PQ_SUBDIM)
                ]
            cb[m] = new
    codes = {
        i: [
            min(cb[m], key=lambda c: (d2(subv(v, m), cb[m][c]), c))
            for m in range(PQ_M)
        ]
        for i, v in corpus.items()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))),
            6,
        )

    got = {}
    for r in QUERIES["pq_ann_topk"](spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rk"], r["neighbor_id"], r["adc_dist"], r["cos_sim"])
        )
    for q in range(PQ_N_QUERY):
        qv = vecs[q]
        tab = [
            {c: d2(subv(qv, m), cb[m][c]) for c in cb[m]} for m in range(PQ_M)
        ]
        adc = {
            i: sum(tab[m][codes[i][m]] for m in range(PQ_M)) for i in corpus
        }
        short = sorted(corpus, key=lambda i: (adc[i], i))[:PQ_RERANK]
        top = sorted(short, key=lambda i: (-cos(qv, vecs[i]), i))[:PQ_TOP_K]
        mine = sorted(got[q])
        assert [n for _, n, _, _ in mine] == top
        for _, n, d, cs in mine:
            assert d == pytest.approx(adc[n], rel=1e-4)
            assert cs == pytest.approx(cos(qv, vecs[n]), abs=2e-6)


def test_pq_adc_correlates_with_true_distance(spark, sf_dir):
    """Per query, ADC distances must rank roughly like true distances
    (positive rank correlation over the scored corpus)."""
    from go_map_reduce_spark.operators.similarity import PQ_N_QUERY

    vecs = _load_vectors(sf_dir)
    rows = QUERIES["pq_ann_topk"](spark, sf_dir).collect()
    for r in rows:
        qv = vecs[r["query_id"]]
        true_d = sum((a - b) ** 2 for a, b in zip(qv, vecs[r["neighbor_id"]]))
        assert r["adc_dist"] >= 0
        # ADC under-/over-estimates but stays the same order of magnitude
        assert true_d == 0 or r["adc_dist"] < true_d * 10 + 1e-6


def test_resize_bytes_roundtrip():
    """Pure-bytes check: resize of a known 5×4 image samples exactly
    rows/cols {0, 2, 4}."""
    from go_map_reduce_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_bmp_nearest,
    )

    w, h = 5, 4
    # make pixel (x,y) identifiable: value = 10y + x replicated over BGR
    rows = [
        bytes(b for x in range(w) for b in [10 * y + x] * 3) for y in range(h)
    ]
    payload = encode_bmp(w, h, rows)
    rw, rh, bpp, px = decode_bmp(resize_bmp_nearest(payload))
    assert (rw, rh, bpp) == (3, 2, 24)
    vals = [px[i] for i in range(0, len(px), 3)]
    assert vals == [0, 2, 4, 20, 22, 24]


def test_resize_halves_dims_on_corpus(spark, sf_dir):
    decoded = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_image_decode"](spark, sf_dir).collect()
    }
    resized = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_image_resize"](spark, sf_dir).collect()
    }
    assert set(decoded) == set(resized)
    for d, r in ((decoded[k], resized[k]) for k in decoded):
        assert r["width"] == (d["width"] + 1) // 2
        assert r["height"] == (d["height"] + 1) // 2
