"""Round-5 batch 1: fuzzy matching, market basket, co-presence,
snapshot diff, deciles, and pruned-exact ANN."""

import duckdb
import pytest

from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "fuzzy_match_names",
    "market_basket_pairs",
    "events_copresence_pairs",
    "snapshot_diff_customers",
    "customer_spend_deciles",
    "ann_pruned_exact_topk",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_fuzzy_blocking_has_no_false_negatives(spark, sf_dir):
    """Deletion-neighborhood candidates ⊇ all lev≤1 pairs (quadratic
    reference computed in DuckDB)."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    truth = {
        (a, b)
        for a, b in con.sql(
            """
            SELECT a.c_name, b.c_name FROM customer a JOIN customer b
            ON a.c_name < b.c_name WHERE levenshtein(a.c_name, b.c_name) <= 1
            """
        ).fetchall()
    }
    got = {
        (r["name_a"], r["name_b"])
        for r in QUERIES["fuzzy_match_names"](spark, sf_dir).collect()
    }
    assert got == truth


def test_market_basket_apriori_prune_is_lossless(spark, sf_dir):
    """Pair support from the pruned plan equals the unpruned pair count
    for every emitted pair (spot-checked directly on lineitem)."""
    rows = QUERIES["market_basket_pairs"](spark, sf_dir).collect()
    assert rows, "expected at least one frequent pair"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    for r in rows[:5]:
        (n,) = con.sql(
            f"""
            WITH items AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem)
            SELECT COUNT(*) FROM items a JOIN items b
            ON a.o = b.o AND a.p = {r['part_a']} AND b.p = {r['part_b']}
            """
        ).fetchone()
        assert n == r["support"]


def test_copresence_pairs_are_within_window(spark, sf_dir):
    """Every emitted pair really has two purchase events ≤ 5 min apart
    (verified against raw events), and u1 < u2."""
    rows = QUERIES["events_copresence_pairs"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    for r in rows[:5]:
        assert r["u1"] < r["u2"]
        (n,) = con.sql(
            f"""
            SELECT COUNT(*) FROM events a JOIN events b
            ON a.event_type = 'purchase' AND b.event_type = 'purchase'
            AND a.user_id = {r['u1']} AND b.user_id = {r['u2']}
            AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
            """
        ).fetchone()
        assert n >= 1


def test_snapshot_diff_classification_counts(spark, sf_dir):
    """added = %17 clones; removed = %13 deletions; changed = %7 bumps
    that survived deletion — verified arithmetically from the key set."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    keys = [k for (k,) in con.sql("SELECT c_custkey FROM customer").fetchall()]
    expect = {
        "added": sum(1 for k in keys if k % 17 == 0),
        "removed": sum(1 for k in keys if k % 13 == 0),
        "changed": sum(1 for k in keys if k % 7 == 0 and k % 13 != 0),
    }
    got = {
        r["change_type"]: r["n"]
        for r in QUERIES["snapshot_diff_customers"](spark, sf_dir)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_deciles_partition_the_customers(spark, sf_dir):
    """Deciles are 1..10, sizes differ by ≤1, and spend ranges are
    non-overlapping in decile order."""
    rows = sorted(
        QUERIES["customer_spend_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo["min_spend"] >= hi["max_spend"]


def test_pruned_ann_equals_brute_force(spark, sf_dir):
    """The pruned plan's top-k is bit-identical to unpruned brute force
    computed directly (admissibility proof by execution)."""
    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.functions.vector import cosine, norm_sq
    from go_map_reduce_spark.operators.similarity2 import (
        PRUNE_N_QUERY,
        PRUNE_TOP_K,
    )
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq"))
    q = e.where(F.col("vec_id") < PRUNE_N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    brute = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            )
            .cast("long"),
        )
        .where(F.col("rk") <= PRUNE_TOP_K)
    )
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    got = sorted(
        QUERIES["ann_pruned_exact_topk"](spark, sf_dir).collect(), key=key
    )
    want = sorted(brute.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _clustered_corpus(spark, n=240, dims=32, n_clusters=3):
    """Deterministic corpus with real cluster structure (low intrinsic
    dimension): 3 well-separated anchors + small per-vector jitter in
    the tail dims. On such data the partial-distance bound prunes; on
    the repo's isotropic synthetic embeddings it cannot (distance
    concentration — documented in similarity2.py)."""
    rows = []
    for i in range(n):
        c = i % n_clusters
        vec = [0.0] * dims
        vec[c] = 10.0  # anchor: clusters live on distinct axes
        # deterministic tail jitter, small relative to the anchor
        for d in range(dims // 2, dims):
            vec[d] = 0.3 * (((i * 31 + d * 17) % 97) / 97.0 - 0.5)
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_pruned_ann_bound_prunes_clustered_data(spark):
    """On a corpus with genuine cluster structure the bound eliminates
    most cross-cluster candidates — and the result stays bit-identical
    to brute force."""
    from go_map_reduce_spark.functions.vector import cosine, norm_sq
    from go_map_reduce_spark.operators import similarity2 as s2
    from pyspark.sql import Window as W

    dims = 32
    emb = _clustered_corpus(spark, dims=dims)
    got = s2.pruned_exact_topk(emb, dims=dims).collect()

    e = emb.select("vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq"))
    q = e.where(F.col("vec_id") < s2.PRUNE_N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    brute = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            )
            .cast("long"),
        )
        .where(F.col("rk") <= s2.PRUNE_TOP_K)
        .collect()
    )
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, brute), key=lambda t: (t[0], t[3])
    )

    # survivor count: reconstruct stage 2 with the module's constants
    from go_map_reduce_spark.functions.vector import dot_product

    hd = s2.PRUNE_HEAD_DIMS
    e2 = emb.select(
        "vec_id",
        "embedding",
        norm_sq(F.col("embedding")).alias("nsq"),
        F.slice("embedding", 1, hd).alias("head"),
        norm_sq(F.slice("embedding", hd + 1, dims - hd)).alias("tail_nsq"),
    )
    q2 = e2.where(F.col("vec_id") < s2.PRUNE_N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
        F.col("head").alias("q_head"),
        F.col("tail_nsq").alias("q_tail_nsq"),
    )
    probe_scored = (
        e2.where(F.col("vec_id") % s2.PRUNE_PROBE_MOD == 0)
        .join(F.broadcast(q2), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
    )
    tau = (
        probe_scored.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cos_sim"))
            ),
        )
        .where(F.col("rk") <= s2.PRUNE_TOP_K)
        .groupBy("query_id")
        .agg(F.min("cos_sim").alias("tau"))
    )
    qt = q2.join(tau, "query_id")
    bound = (
        dot_product(F.col("q_head"), F.col("head"))
        + F.sqrt(F.col("q_tail_nsq") * F.col("tail_nsq"))
    ) / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("nsq")))
    all_pairs = e2.join(F.broadcast(qt), F.col("vec_id") != F.col("query_id"))
    n_total = all_pairs.count()
    n_kept = all_pairs.where(
        (bound >= F.col("tau") - s2.PRUNE_SLACK)
        | (F.col("vec_id") % s2.PRUNE_PROBE_MOD == 0)
    ).count()
    assert n_kept < n_total * 0.5, (n_kept, n_total)


def test_pruned_ann_short_probe_falls_back_to_brute_force(spark):
    """τ admissibility when the probe subset is non-empty but smaller
    than top_k: min over fewer than k probe scores can EXCEED the true
    k-th best, so pruning with it would drop true neighbors. The
    fallback (n_probe < top_k → τ = -2, keep everything) must make the
    result bit-identical to brute force.

    Adversarial construction: the two probe vectors are near-copies of
    the query (probe scores ≈ 1), every other vector is head-orthogonal
    to the query with a tiny tail (bound ≈ ε ≪ 1) — an inadmissible τ
    of ≈1 would eliminate all of them even though they fill the true
    top-k."""
    from pyspark.sql import Window as W

    from go_map_reduce_spark.functions.vector import cosine, norm_sq
    from go_map_reduce_spark.operators import similarity2 as s2

    dims, probe_mod, top_k = 32, 8, 8
    rows = []
    for i in range(20):
        vec = [0.0] * dims
        if i == 0 or i % probe_mod == 0:  # query + probes: all-tail mass
            vec[dims - 1] = 1.0
            vec[dims - 2] = 0.001 * i  # probes not exactly the query
        else:  # everyone else: head mass + tiny aligned tail
            vec[0] = 1.0
            vec[dims - 1] = 0.01
        rows.append((i, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    got = s2.pruned_exact_topk(
        emb, dims=dims, n_query=1, top_k=top_k, probe_mod=probe_mod
    ).collect()

    e = emb.select("vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq"))
    q = e.where(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    brute = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            )
            .cast("long"),
        )
        .where(F.col("rk") <= top_k)
        .collect()
    )
    assert len(brute) == top_k  # the corpus really does fill the top-k
    key = lambda t: (t[0], t[3])  # noqa: E731
    assert sorted(map(tuple, got), key=key) == sorted(map(tuple, brute), key=key)
