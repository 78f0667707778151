"""Pipeline operators, batch 2: cohort retention, SCD2 dimension merge,
bloom-filter membership pre-filtering, winsorized robust statistics.

Each extends a §2c category the reference lacks entirely (SURVEY.md:
joins/aggregations ABSENT) with a shape a production 100 TB pipeline
actually runs:

- cohort_retention — the product-analytics crosstab (first-activity
  cohort × week offset), two aggregations sharing one user_id shuffle.
- scd2_customer_upsert — MERGE INTO semantics (lakehouse upsert)
  expressed Spark-first as semi/anti splits + union: type-2 history
  with valid_from/valid_to/is_current. The update set is tiny relative
  to the dimension, so both side-joins broadcast it.
- bloom_contamination_prefilter — a REAL distributed bloom filter built
  with native aggregation: k hashed bit positions per element, bitmap
  chunks assembled with bit_or, probe side checks all k bits via a
  broadcast join against the 16 K-row bitmap. This is the 100 TB
  pre-filter for contamination_check (dedup.py): the exact join
  shuffles every test shingle against the train vocabulary; the bloom
  probe replaces that with a broadcast of a ~128 KB bitmap and drops
  the guaranteed-clean majority before the exact join runs. False
  positives are quantified against the exact answer in the output.
- winsorized_price_stats — robust aggregates: clip to the [p5, p95]
  range per group before averaging (the outlier guard of metric
  pipelines); exact percentile + broadcast-back-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from go_map_reduce_spark.registry import query, track_cache


# --------------------------------------------------------------------------
# Cohort retention
# --------------------------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events
    ),
    cohort_sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_active,
           s.n_cohort,
           CAST(COUNT(*) AS DOUBLE) / s.n_cohort AS retention
    FROM firsts f
    JOIN activity a ON a.user_id = f.user_id
    JOIN cohort_sizes s ON s.cohort_week = f.cohort_week
    GROUP BY f.cohort_week, week_offset, s.n_cohort
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-event week, and
    for each later week the fraction of the cohort still active. Both
    the firsts aggregation and the distinct-activity frame shuffle on
    user_id — one exchange layout reused across the pipeline; cohort
    sizes are a tiny dim joined broadcast. Weeks are Monday-truncated
    on both engines, so the day-difference is an exact multiple of 7."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("timestamp_ntz").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("timestamp_ntz").alias("wk")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        firsts.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
                "retention"
            ),
        )
    )


# --------------------------------------------------------------------------
# SCD2 merge upsert
# --------------------------------------------------------------------------
V1_FROM = "TIMESTAMP '2024-01-01 00:00:00'"
V2_FROM = "TIMESTAMP '2024-06-01 00:00:00'"


@query(
    "scd2_customer_upsert",
    oracle=f"""
    WITH updates AS (
      SELECT c_custkey, c_name, 'MOBILE' AS c_mktsegment,
             c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           1 AS version, {V1_FROM} AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           1 AS version, {V1_FROM} AS valid_from,
           {V2_FROM} AS valid_to, FALSE AS is_current
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           2 AS version, {V2_FROM} AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM updates
    """,
)
def scd2_customer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 upsert — MERGE INTO semantics
    composed from relational primitives: rows untouched by the update
    batch stay current; matched rows are closed (valid_to set,
    is_current false) AND superseded by a new current version. The
    split is a broadcast semi/anti join against the update keyset (an
    update batch is tiny relative to the dimension), and the three
    branches union — exactly the shuffle profile a lakehouse MERGE
    plans for the same inputs. The update batch is derived
    deterministically here (every 7th key moves to segment MOBILE with
    an acctbal adjustment) so the oracle can rebuild it."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    updates = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        F.lit("MOBILE").alias("c_mktsegment"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
    )
    v1_from = F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'")
    v2_from = F.expr("TIMESTAMP_NTZ '2024-06-01 00:00:00'")
    null_date = F.lit(None).cast("timestamp_ntz")
    untouched = cust.where(F.col("c_custkey") % 7 != 0).select(
        "*",
        F.lit(1).alias("version"),
        v1_from.alias("valid_from"),
        null_date.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = cust.where(F.col("c_custkey") % 7 == 0).select(
        "*",
        F.lit(1).alias("version"),
        v1_from.alias("valid_from"),
        v2_from.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_rows = updates.select(
        "*",
        F.lit(2).alias("version"),
        v2_from.alias("valid_from"),
        null_date.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return untouched.unionByName(closed).unionByName(new_rows)


# --------------------------------------------------------------------------
# Bloom-filter contamination pre-filter
# --------------------------------------------------------------------------
BLOOM_BITS = 1 << 20        # 2^20 bit positions
BLOOM_WORD = 63             # bits packed per chunk (63 dodges the sign bit)
# Three independent affine position hashes over the 28-bit md5-prefix
# base hash (the minhash trick, dedup.py): products stay < 2^60.
BLOOM_SEEDS = [(2_654_435_761, 0x1F3D), (2_246_822_519, 0x9E37), (3_266_489_917, 0x85EB)]

_SQL_BLOOM_BASE = "CAST(concat('0x', substr(md5(shingle), 1, 7)) AS BIGINT)"


def _sql_positions(h: str) -> list[str]:
    return [f"(({a} * {h} + {b}) % {BLOOM_BITS})" for a, b in BLOOM_SEEDS]


@query(
    "bloom_contamination_prefilter",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(toks) < 3
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(range(1, len(toks)),
                                        i -> array_to_string(toks[i:i+1], ' '))
               END)) AS shingle
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                               x -> x <> '') AS toks
            FROM documents)
    ),
    hashed AS (SELECT doc_id, shingle, {_SQL_BLOOM_BASE} AS h FROM sh),
    train_pos AS (
      SELECT DISTINCT pos FROM hashed,
             unnest([{', '.join(_sql_positions('h'))}]) t(pos)
      WHERE doc_id % 10 <> 0
    ),
    bloom AS (
      SELECT pos // {BLOOM_WORD} AS chunk,
             bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD} AS INTEGER)) AS bits
      FROM train_pos GROUP BY 1
    ),
    test AS (SELECT doc_id, shingle, h FROM hashed WHERE doc_id % 10 = 0),
    probe AS (
      SELECT t.doc_id, t.shingle,
             BOOL_AND(b.bits IS NOT NULL AND
                      (b.bits & (1::BIGINT << CAST(p.pos % {BLOOM_WORD} AS INTEGER)))
                      <> 0) AS maybe
      FROM test t,
           unnest([{', '.join(_sql_positions('t.h'))}]) p(pos)
      LEFT JOIN bloom b ON b.chunk = p.pos // {BLOOM_WORD}
      GROUP BY t.doc_id, t.shingle
    ),
    train_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <> 0)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(count_if(p.maybe) AS BIGINT) AS n_maybe,
           CAST(COUNT(tr.shingle) AS BIGINT) AS n_exact
    FROM probe p LEFT JOIN train_sh tr ON p.shingle = tr.shingle
    GROUP BY p.doc_id
    """,
)
def bloom_contamination_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bloom filter as a native aggregation — the scale
    path for membership pre-filtering. Train-split shingles hash to
    {len(BLOOM_SEEDS)} of {BLOOM_BITS} bit positions; the bitmap lives
    as (chunk, bits) rows built with bit_or — mergeable partial
    aggregation, so construction is one map-side-combined shuffle of
    8-byte positions. The probe side joins the bitmap BROADCAST
    (~16 K rows ≈ 128 KB regardless of corpus size — that is the whole
    point: at 100 TB the exact-join contamination check shuffles every
    test shingle, while this probe ships a fixed-size bitmap to the
    data) and keeps a shingle only if all k bits are set. n_maybe ≥
    n_exact always (no false negatives); n_maybe − n_exact measures the
    false-positive rate actually achieved. 2-gram shingles (not the
    dedup stack's 3-grams) so the filter sees a denser key space.

    Reference parity note: this generalizes the reference's only
    filtering primitive (the map-side dedup set, mrapps/indexer.go:
    21-26) to a probabilistic, fixed-memory, distributed form."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from go_map_reduce_spark.functions.texttok import kgrams

    tk = F.col("__toks")
    shingle_arr = F.when(
        F.size(tk) < 3, F.array(F.concat_ws(" ", tk))
    ).otherwise(kgrams(tk, 2))
    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    sh = (
        docs.select("doc_id", toks.alias("__toks"))
        .select("doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle"))
    )
    h = F.conv(F.substring(F.md5("shingle"), 1, 7), 16, 10).cast("long")
    hashed = sh.select("doc_id", "shingle", h.alias("h")).persist().transform(track_cache)
    pos_cols = [
        ((F.lit(a) * F.col("h") + F.lit(b)) % BLOOM_BITS).alias(f"p{j}")
        for j, (a, b) in enumerate(BLOOM_SEEDS)
    ]
    train_pos = (
        hashed.where(F.col("doc_id") % 10 != 0)
        .select(F.explode(F.array(*pos_cols)).alias("pos"))
        .distinct()
    )
    bloom = train_pos.groupBy(
        (F.col("pos") / BLOOM_WORD).cast("long").alias("chunk")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))")
        ).alias("bits")
    )
    test = hashed.where(F.col("doc_id") % 10 == 0)
    probe = (
        test.select(
            "doc_id", "shingle", F.explode(F.array(*pos_cols)).alias("pos")
        )
        .join(
            F.broadcast(bloom),
            (F.col("pos") / BLOOM_WORD).cast("long") == F.col("chunk"),
            "left",
        )
        .select(
            "doc_id",
            "shingle",
            (
                F.col("bits").isNotNull()
                & (
                    F.col("bits").bitwiseAND(
                        F.expr(
                            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
                        )
                    )
                    != 0
                )
            ).alias("hit"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.bool_and("hit").alias("maybe"))
    )
    train_sh = (
        hashed.where(F.col("doc_id") % 10 != 0)
        .select("shingle")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    return (
        probe.join(train_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count_if(F.col("maybe")).alias("n_maybe"),
            F.count("present").alias("n_exact"),
        )
    )


# --------------------------------------------------------------------------
# Winsorized statistics
# --------------------------------------------------------------------------
@query(
    "winsorized_price_stats",
    oracle=f"""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           {sql_davg('l.l_extendedprice')} AS raw_mean,
           {sql_davg('least(greatest(l.l_extendedprice, b.lo), b.hi)')}
             AS winsorized_mean,
           b.lo AS p05, b.hi AS p95,
           CAST(count_if(l.l_extendedprice < b.lo OR l.l_extendedprice > b.hi)
                AS BIGINT) AS n_clipped
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag, b.lo, b.hi
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-to-[p5,p95]) means per group — the outlier
    guard of metric pipelines. Exact percentiles per group (holistic —
    sorts the group; the sketch variant is the huge-group path), then
    the 3-row bounds frame broadcasts back onto the fact scan: two
    passes over lineitem, no per-row window. Means run through the
    decimal discipline; least/greatest clipping is per-row IEEE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            davg(F.col("l_extendedprice")).alias("raw_mean"),
            davg(clipped).alias("winsorized_mean"),
            F.count_if(
                (F.col("l_extendedprice") < F.col("lo"))
                | (F.col("l_extendedprice") > F.col("hi"))
            ).alias("n_clipped"),
        )
        .select(
            "l_returnflag",
            "raw_mean",
            "winsorized_mean",
            F.col("lo").alias("p05"),
            F.col("hi").alias("p95"),
            "n_clipped",
        )
    )
