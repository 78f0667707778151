"""Round-5 batch 11: latest-state compaction, RFM, k-NN label purity."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "events_latest_per_user_type",
    "rfm_customer_segments",
    "knn_label_purity_ann",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_compaction_keeps_exactly_one_newest_per_key(spark, sf_dir):
    rows = QUERIES["events_latest_per_user_type"](spark, sf_dir).collect()
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    (n_keys,) = con.sql(
        "SELECT COUNT(*) FROM (SELECT DISTINCT user_id, event_type FROM events)"
    ).fetchone()
    assert len(rows) == n_keys
    # spot-check: the kept event really is that key's newest
    r = rows[0]
    (mx,) = con.sql(
        f"""SELECT max(epoch_us(ts)) FROM events
            WHERE user_id = {r['user_id']}
              AND event_type = '{r['event_type']}'"""
    ).fetchone()
    (kept,) = con.sql(
        f"SELECT epoch_us(ts) FROM events WHERE event_id = {r['event_id']}"
    ).fetchone()
    assert kept == mx


def test_rfm_cells_partition_customers(spark, sf_dir):
    """Every customer lands in exactly one segment; scores are 1-5 on
    all three axes; total revenue reconciles."""
    rows = QUERIES["rfm_customer_segments"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    (n_cust, total) = con.sql(
        """SELECT COUNT(DISTINCT o_custkey),
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           FROM orders"""
    ).fetchone()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert abs(sum(r["segment_revenue"] for r in rows) - total) < 1e-3
    for r in rows:
        a, b, c = r["segment"].split("-")
        assert all(1 <= int(x) <= 5 for x in (a, b, c))


def test_brute_purity_matches_its_oracle(spark, sf_dir):
    """The eval-only brute tier (demoted from the driver registry — its
    all-pairs scoring is the quadratic path) stays differentially
    pinned against its DuckDB twin here."""
    from go_map_reduce_spark.operators.pipeline18 import (
        KNN_PURITY_BRUTE_ORACLE,
        knn_label_purity,
    )

    compare(knn_label_purity(spark, sf_dir), KNN_PURITY_BRUTE_ORACLE, sf_dir)


def test_purity_bounds_and_coverage(spark, sf_dir):
    """Purity in [0,1] per class; every vector contributes; on this
    noise-dominated corpus purity sits near chance (documented in the
    operator — the metric reports, it does not flatter). Runs the
    EVAL-ONLY brute tier (function call, not registry)."""
    from go_map_reduce_spark.operators.pipeline18 import (
        PURITY_SAMPLE_MOD,
        knn_label_purity,
    )

    rows = knn_label_purity(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    per_label = dict(
        con.sql(
            f"""SELECT label, COUNT(*) FROM embeddings
                WHERE vec_id % {PURITY_SAMPLE_MOD} = 0 GROUP BY label"""
        ).fetchall()
    )
    for r in rows:
        assert 0.0 <= r["purity"] <= 1.0
        assert r["n_vectors"] == per_label[r["label"]]
    n_total = sum(per_label.values())
    mean_purity = sum(r["purity"] * r["n_vectors"] for r in rows) / n_total
    assert mean_purity < 0.5  # noise corpus: far from perfectly clustered


def test_ann_purity_near_chance_like_brute(spark, sf_dir):
    """The registered ANN-fed tier reports the same qualitative verdict
    as the brute tier on this noise corpus: near-chance mean purity.
    (Exact equality is not expected — bucketing changes the neighbor
    sets — but the METRIC must not flatter under either generator.)"""
    rows = QUERIES["knn_label_purity_ann"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r["n_vectors"] for r in rows)
    mean_purity = sum(r["purity"] * r["n_vectors"] for r in rows) / n_total
    assert 0.0 <= mean_purity < 0.5


def test_degenerate_bucket_cap_bounds_candidates(spark):
    """Adversarial frame: 200 vectors collide into ONE sign-LSH bucket
    (the 256-fixed-bucket worst case). The candidate cap must bound
    per-query pair work at `cap` (not 199) while still ranking EVERY
    vector as a query, and selection must be the deterministic vec_id
    prefix — all mirrored in the registered oracle's `cand` CTE."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.operators.pipeline18 import (
        PURITY_K,
        _ann_purity,
    )
    from go_map_reduce_spark.functions.vector import norm_sq

    n, cap = 200, 16
    rows = [
        # all-positive embeddings → identical sign bucket; vec_id i gets
        # a distinct direction so cosine ranks are nontrivial
        (i, [1.0 + (i % 7), 1.0 + ((i * 3) % 5), 1.0], f"L{i % 2}")
        for i in range(n)
    ]
    e = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
        .select(
            "vec_id",
            "embedding",
            "label",
            F.lit("11111111").alias("bucket"),
            norm_sq(F.col("embedding")).alias("nsq"),
        )
    )
    out = _ann_purity(e, cap).collect()
    # every vector is still a query
    assert sum(r["n_vectors"] for r in out) == n
    # ranked pairs per query are bounded by min(PURITY_K, visible
    # candidates): cap bucket members, minus itself when it IS one
    expected_pairs = sum(
        min(PURITY_K, cap - (1 if qid < cap else 0)) for qid in range(n)
    )
    matched_pairs = sum(r["n_same_label"] for r in out)
    assert matched_pairs <= expected_pairs
    # a cap >= bucket size must reduce to the uncapped sweep
    full = _ann_purity(e, n).collect()
    assert sum(r["n_vectors"] for r in full) == n
    # DISCRIMINATING check (the bound above also holds uncapped): with
    # cap < PURITY_K + 1 every query sees at most `cap` candidates, so
    # total ranked pairs — reconstructed exactly from n_same_label /
    # purity per label — must equal the closed form, which the uncapped
    # sweep (PURITY_K pairs per query) cannot match
    tiny = 3
    tiny_out = _ann_purity(e, tiny).collect()
    total_pairs = sum(
        int(round(r["n_same_label"] / r["purity"])) for r in tiny_out
        if r["purity"] > 0
    )
    expected_tiny = sum(
        min(PURITY_K, tiny - (1 if qid < tiny else 0)) for qid in range(n)
    )
    uncapped_pairs = n * PURITY_K
    assert expected_tiny < uncapped_pairs  # the two outcomes differ
    assert total_pairs == expected_tiny


def test_bucket_cap_selection_is_deterministic_vec_id_prefix(spark):
    """The capped candidate set is exactly the lowest-vec_id `cap`
    members of the bucket — run twice, same result (no nondeterministic
    row_number ties: vec_id is unique)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from go_map_reduce_spark.functions.vector import norm_sq

    rows = [(i, [1.0, float(i % 3 + 1)], "x") for i in range(50)]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).select(
        "vec_id", "embedding", "label",
        F.lit("b").alias("bucket"),
        norm_sq(F.col("embedding")).alias("nsq"),
    )
    crk = F.row_number().over(W.partitionBy("bucket").orderBy("vec_id"))
    got = sorted(
        r["vec_id"]
        for r in e.withColumn("crk", crk).where(F.col("crk") <= 10).collect()
    )
    assert got == list(range(10))


def test_degenerate_bucket_cap_matches_duckdb_oracle(spark):
    """Exact differential on the adversarial one-bucket frame: the
    capped Spark pipeline must equal an independent DuckDB formulation
    of the same semantics (vec_id-prefix candidates, top-K by cosine
    with vec_id tiebreak, per-label purity) — not just satisfy
    bounds."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from go_map_reduce_spark.functions.vector import norm_sq
    from go_map_reduce_spark.operators.pipeline18 import PURITY_K, _ann_purity

    n, cap = 60, 8
    rows = [
        (i, [1.0 + (i % 7), 1.0 + ((i * 3) % 5), 1.0], f"L{i % 3}")
        for i in range(n)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).select(
        "vec_id", "embedding", "label",
        F.lit("b").alias("bucket"),
        norm_sq(F.col("embedding")).alias("nsq"),
    )
    got = (
        _ann_purity(e, cap)
        .toPandas()
        .sort_values("label", ignore_index=True)
    )

    pdf = pd.DataFrame(
        rows, columns=["vec_id", "embedding", "label"]
    )
    con = duckdb.connect()
    con.register("emb", pdf)
    want = con.sql(f"""
        WITH e AS (
          SELECT vec_id, embedding, label,
                 list_reduce(list_transform(embedding, x -> x * x),
                             (a, b) -> a + b) AS nsq
          FROM emb
        ),
        cand AS (
          SELECT * FROM (
            SELECT e.*, row_number() OVER (ORDER BY vec_id) AS crk FROM e
          ) WHERE crk <= {cap}
        ),
        scored AS (
          SELECT q.vec_id, q.label AS own_label, c.label AS nb_label,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_reduce(
                     list_transform(range(1, len(q.embedding) + 1),
                       i -> q.embedding[i] * c.embedding[i]),
                     (a, b) -> a + b) / sqrt(q.nsq * c.nsq) DESC,
                   c.vec_id
                 ) AS rk
          FROM e q JOIN cand c ON c.vec_id <> q.vec_id
        )
        SELECT own_label AS label,
               CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
               CAST(SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_same_label,
               round(SUM(CASE WHEN nb_label = own_label THEN 1.0 ELSE 0.0 END)
                     / COUNT(*), 6) AS purity
        FROM scored WHERE rk <= {PURITY_K}
        GROUP BY own_label ORDER BY own_label
    """).df()
    assert got["label"].tolist() == want["label"].tolist()
    assert got["n_vectors"].tolist() == want["n_vectors"].tolist()
    assert got["n_same_label"].tolist() == want["n_same_label"].tolist()
    assert got["purity"].tolist() == want["purity"].tolist()
