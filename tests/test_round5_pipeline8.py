"""Round-5 batch 3: transition matrix, revenue share, stratified
fixed-n sample, MIPS, label propagation, weekday seasonality."""

import duckdb
import pytest

from pyspark.sql import Window as W, functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "event_transition_matrix",
    "revenue_share_within_region",
    "stratified_fixed_n_sample",
    "mips_topk",
    "label_propagation_communities",
    "dow_seasonality_revenue",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_transition_rows_are_probability_distributions(spark, sf_dir):
    """Per current-state probabilities sum to ~1 (6dp rounding slack)
    and transition counts reconcile with the raw event count."""
    rows = QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    assert rows
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r["cur"], []).append(r)
    for cur, rs in by_cur.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, cur
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    (n_events,) = con.sql("SELECT COUNT(*) FROM events").fetchone()
    (n_users,) = con.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()
    # every event except each user's last has exactly one successor
    assert sum(r["n"] for r in rows) == n_events - n_users


def test_revenue_shares_sum_to_one_per_region(spark, sf_dir):
    rows = QUERIES["revenue_share_within_region"](spark, sf_dir).collect()
    assert rows
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], 0.0)
        by_region[r["region"]] += r["share"]
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-4, (region, s)


def test_stratified_sample_exact_n_and_stable(spark, sf_dir):
    """Exactly min(N, |stratum|) rows per language; identical across
    two runs (md5 determinism)."""
    from go_map_reduce_spark.operators.pipeline8 import STRAT_N

    a = QUERIES["stratified_fixed_n_sample"](spark, sf_dir).collect()
    b = QUERIES["stratified_fixed_n_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    sizes = dict(con.sql("SELECT lang, COUNT(*) FROM documents GROUP BY lang").fetchall())
    per_lang = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert per_lang == {lang: min(STRAT_N, n) for lang, n in sizes.items()}


def test_mips_norm_augmentation_preserves_ranking(spark, sf_dir):
    """The Bachrach norm-augmentation reduction: ranking by cosine over
    augmented vectors [c, √(M²−‖c‖²)] with augmented queries [q, 0]
    equals ranking by raw inner product — pinned by executing both."""
    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.functions.vector import dot_product, norm_sq
    from go_map_reduce_spark.operators.pipeline8 import MIPS_N_QUERY, MIPS_TOP_K

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    m2 = emb.agg(F.max(norm_sq(F.col("embedding"))).alias("m2"))
    c = emb.crossJoin(F.broadcast(m2)).select(
        "vec_id",
        "embedding",
        F.sqrt(F.col("m2") - norm_sq(F.col("embedding"))).alias("aug"),
        norm_sq(F.col("embedding")).alias("nsq"),
        F.col("m2"),
    )
    q = emb.where(F.col("vec_id") < MIPS_N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_sq(F.col("embedding")).alias("q_nsq"),
    )
    # cos(q', c') = dot(q,c) / (‖q‖·M): rank-equivalent to dot per query
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot_product(F.col("q_emb"), F.col("embedding"))
            / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("m2")))
        ).alias("aug_cos"),
    )
    waug = W.partitionBy("query_id").orderBy(F.desc("aug_cos"), F.asc("neighbor_id"))
    aug_top = (
        scored.withColumn("rk", F.row_number().over(waug).cast("long"))
        .where(F.col("rk") <= MIPS_TOP_K)
        .select("query_id", "neighbor_id", "rk")
        .collect()
    )
    mips = (
        QUERIES["mips_topk"](spark, sf_dir)
        .select("query_id", "neighbor_id", "rk")
        .collect()
    )
    assert sorted(map(tuple, aug_top)) == sorted(map(tuple, mips))


def test_lpa_coarsens_communities(spark, sf_dir):
    """After propagation there are FEWER distinct labels than nodes
    (some labels spread), and every community id is itself a node id."""
    rows = QUERIES["label_propagation_communities"](spark, sf_dir).collect()
    assert rows
    nodes = {r["node"] for r in rows}
    comms = {r["community"] for r in rows}
    assert len(comms) < len(nodes)
    assert comms <= nodes


def test_seasonality_residuals_center_on_zero_per_dow(spark, sf_dir):
    """Residuals against the per-dow mean must sum to ~0 within each
    weekday (definition of a mean baseline)."""
    rows = QUERIES["dow_seasonality_revenue"](spark, sf_dir).collect()
    assert rows
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r["dow"], []).append(r["residual"])
    for dow, res in by_dow.items():
        assert abs(sum(res)) < 1e-2 * max(1, len(res)), dow
