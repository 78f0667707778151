"""Exact distributed statistics: OLS regression from integer sufficient
statistics, and positional median + deterministic mode.

Both queries extend the engine's float-determinism discipline
(functions/numeric.py, price_quantity_correlation precedent) to the
remaining classic aggregates Spark offers only as order-sensitive
doubles (regr_slope/regr_r2, percentile, mode): every data-dependent
reduction is an exact integer (or count) sum, and the float arithmetic
afterwards is a fixed per-group op sequence mirrored textually in the
oracle — so the distributed result is bit-identical to the sequential
one at ANY parallelism, the same property the reference gets trivially
from single-threaded reduce (main/mrsequential.go:18-46).

Scale: each query is one scan + one groupBy (sufficient statistics are
map-side combinable); the median's per-group sort rides a window over
the group's rows — bounded by group cardinality, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum
from go_map_reduce_spark.registry import query


@query(
    "regression_price_on_quantity",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS qi,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pi
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(qi) AS DOUBLE) AS sx,
             CAST(SUM(pi) AS DOUBLE) AS sy,
             CAST(SUM(CAST(qi AS DECIMAL(38,0)) * qi) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(pi AS DECIMAL(38,0)) * pi) AS DOUBLE) AS syy,
             CAST(SUM(CAST(qi AS DECIMAL(38,0)) * pi) AS DOUBLE) AS sxy
      FROM c GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n,
             n * sxy AS nxy, sx * sy AS xy,
             n * sxx AS nxx, sx * sx AS xx,
             n * syy AS nyy, sy * sy AS yy,
             sx, sy
      FROM s
    ),
    k AS (
      SELECT l_returnflag, n, sx, sy,
             (nxy - xy) AS cov_n, (nxx - xx) AS varx_n, (nyy - yy) AS vary_n
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           cov_n / varx_n AS slope,
           (sy - cov_n / varx_n * sx) / n / 100.0 AS intercept,
           (cov_n / varx_n) * (cov_n / vary_n) AS r2
    FROM k
    """,
)
def regression_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extendedprice on quantity — slope,
    intercept (dollars), R² — from EXACT integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy² over cent-ints), single pass, map-side
    combinable, no second scan for residuals.

    R² is computed as slope·(cov/vary) — algebraically (cov²)/(varx·vary)
    but written as the same two-division sequence in both engines so the
    IEEE op order matches bit-for-bit. Intercept converts back to
    dollars at the end (cents cancel in the slope). The only per-group
    state is seven numbers — at 100 TB this aggregates in one shuffle of
    56-byte rows. All three co-moment sums ride DECIMAL(38,0): a cent²
    product is ~1e14 and Σ over 1e9+ rows passes int64's 9.2e18 — the
    silent-wraparound hazard price_quantity_correlation's per-term
    analysis bounds per scale factor is removed here unconditionally."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qi"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pi"),
    )
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qi").cast("double").alias("sx"),
        F.sum("pi").cast("double").alias("sy"),
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("qi"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("pi").cast("decimal(38,0)") * F.col("pi"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("pi"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    m = s.select(
        "l_returnflag",
        "n",
        (n * F.col("sxy")).alias("nxy"),
        (F.col("sx") * F.col("sy")).alias("xy"),
        (n * F.col("sxx")).alias("nxx"),
        (F.col("sx") * F.col("sx")).alias("xx"),
        (n * F.col("syy")).alias("nyy"),
        (F.col("sy") * F.col("sy")).alias("yy"),
        "sx",
        "sy",
    )
    k = m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        (F.col("nxy") - F.col("xy")).alias("cov_n"),
        (F.col("nxx") - F.col("xx")).alias("varx_n"),
        (F.col("nyy") - F.col("yy")).alias("vary_n"),
    )
    slope = F.col("cov_n") / F.col("varx_n")
    return k.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n") / 100.0).alias(
            "intercept"
        ),
        (slope * (F.col("cov_n") / F.col("vary_n"))).alias("r2"),
    )


@query(
    "quantity_median_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS qi
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, qi,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY qi) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM c
    ),
    med AS (
      SELECT l_returnflag,
             CAST(MAX(n) AS BIGINT) AS n,
             (CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN qi ELSE 0 END) AS DOUBLE)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN qi ELSE 0 END)) / 2.0 / 100.0
               AS median_qty
      FROM ranked GROUP BY l_returnflag
    ),
    freq AS (
      SELECT l_returnflag, qi, COUNT(*) AS cnt
      FROM c GROUP BY l_returnflag, qi
    ),
    mode AS (
      SELECT l_returnflag,
             CAST(qi AS DOUBLE) / 100.0 AS mode_qty,
             CAST(cnt AS BIGINT) AS mode_count
      FROM (
        SELECT l_returnflag, qi, cnt,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, qi) AS rk
        FROM freq
      ) WHERE rk = 1
    )
    SELECT med.l_returnflag, n, median_qty, mode_qty, mode_count
    FROM med JOIN mode ON med.l_returnflag = mode.l_returnflag
    """,
)
def quantity_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and deterministic mode of l_quantity.

    Spark's `percentile` and `mode` are avoided on purpose: percentile
    interpolates with engine-specific float ops and mode breaks ties
    arbitrarily. Median here is POSITIONAL — rank within group, average
    the two middle cent-ints with one fixed float sequence — and mode
    ties break to the smallest value (rank by count desc, value asc):
    both reproducible on any engine, any parallelism.

    Scale shape: the rank window sorts within each group's hash
    partition (no global sort); the mode is a two-level aggregation
    (group×value counts, then top-1 per group via WindowGroupLimit —
    Spark pushes the rk=1 filter into a partial top-k below the
    shuffle)."""
    c = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qi"),
    )
    ranked = c.select(
        "l_returnflag",
        "qi",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("qi"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    lo = (F.col("n") + 1) / 2
    hi = (F.col("n") + 2) / 2
    med = ranked.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        (
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.floor(lo).cast("long"), F.col("qi")
                    ).otherwise(F.lit(0))
                ).cast("double")
                + F.sum(
                    F.when(
                        F.col("rn") == F.floor(hi).cast("long"), F.col("qi")
                    ).otherwise(F.lit(0))
                )
            )
            / 2.0
            / 100.0
        ).alias("median_qty"),
    )
    freq = c.groupBy("l_returnflag", "qi").agg(F.count(F.lit(1)).alias("cnt"))
    rk = F.row_number().over(
        Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("qi"))
    )
    mode = (
        freq.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            (F.col("qi").cast("double") / 100.0).alias("mode_qty"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )
    return med.join(mode, "l_returnflag")


MAD_K = 3  # flag values more than K MADs from the median


@query(
    "events_anomaly_mad",
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS vi, value
      FROM events
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vi) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    med AS (
      SELECT event_type,
             (CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN vi ELSE 0 END) AS DOUBLE)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN vi ELSE 0 END)) / 2.0 AS m
      FROM r1 GROUP BY event_type
    ),
    d AS (
      SELECT c.event_id, c.event_type, c.value, abs(c.vi - med.m) AS dev
      FROM c JOIN med USING (event_type)
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    mad AS (
      SELECT event_type,
             (SUM(CASE WHEN rn = (n + 1) // 2 THEN dev ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev ELSE 0 END)) / 2.0
               AS mad
      FROM r2 GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.dev / 100.0 AS deviation
    FROM d JOIN mad USING (event_type)
    WHERE mad.mad > 0 AND d.dev > {MAD_K} * mad.mad
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: events whose value sits more than
    {MAD_K} median-absolute-deviations from their type's median — the
    outlier filter a data pipeline runs where mean/stddev would be
    dragged by the very outliers it hunts.

    Both medians are POSITIONAL over exact cent-ints (deviations
    quantize to half-cents, still exact in double), so the flag
    threshold compares identical values on both engines — no
    distributional approximation anywhere. Two grouped median passes =
    two window sorts within each event_type's hash partition; group
    cardinality bounds the sort, nothing global."""
    c = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100).cast("long").alias("vi"),
    )
    def _group_median(df, val_col, out_name):
        w = Window.partitionBy("event_type").orderBy(val_col)
        ranked = df.select(
            "event_type",
            F.col(val_col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        lo = F.floor((F.col("n") + 1) / 2).cast("long")
        hi = F.floor((F.col("n") + 2) / 2).cast("long")
        return ranked.groupBy("event_type").agg(
            (
                (
                    F.sum(
                        F.when(F.col("rn") == lo, F.col(val_col)).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                    + F.sum(
                        F.when(F.col("rn") == hi, F.col(val_col)).otherwise(
                            F.lit(0)
                        )
                    )
                )
                / 2.0
            ).alias(out_name)
        )

    med = _group_median(c.select("event_type", "vi"), "vi", "m")
    d = c.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("vi") - F.col("m")).alias("dev"),
    )
    mad = _group_median(d.select("event_type", "dev"), "dev", "mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.col("dev") > MAD_K * F.col("mad")))
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("dev") / 100.0).alias("deviation"),
        )
    )


# Descending-revenue percentile bins for the two-phase Pareto ranking
# (the pipeline14 RANK_BINS convention; on a cluster, ~one bin per
# 2-4 tasks keeps the intra-bin sorts balanced even under revenue skew
# because edges are revenue QUANTILES — equal-population by design).
PARETO_BINS = 16


@query(
    "customer_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER () AS total
      FROM rev
    )
    SELECT o_custkey,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(rk AS BIGINT) AS rk,
           CAST(cum AS DOUBLE) / total AS cum_share
    FROM ranked
    WHERE (cum - cents) * 2 < total
    """,
)
def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the Pareto question): the smallest set of
    top customers covering 50% of total revenue, with each member's
    rank and cumulative share.

    All accumulation is integer cents — the running sum, the total, and
    the INCLUSION TEST ((cum − own) × 2 < total, i.e. "the customers
    above me don't reach half") are exact int64 comparisons; the only
    float is the final share division, one identical op per row.

    TWO-PHASE ranking/cumsum (r10 verdict task 4 — was the engine's
    last single-partition window over an unbounded per-entity frame):
    (1) revenue-percentile BIN EDGES from one holistic aggregate split
    customers into {PARETO_BINS} descending-revenue ranges; (2) per-bin
    (count, cents-sum) — a ≤{PARETO_BINS}+1-row frame — turn into rank
    and cumsum OFFSETS plus the grand total with windows over that tiny
    frame; (3) each customer's rank/cum = its bin's offsets + its
    INTRA-BIN row_number/running sum, where the intra windows partition
    BY BIN — parallel across bins, never one task (the pipeline14
    global_price_rank_twophase pattern).  Edge ties are safe: customers
    whose cents equal an edge all land in the same bin (strictly-above
    count), and (cents desc, custkey) inside the bin completes the
    total order, so the output is hash-identical to the naive global
    window the oracle still runs."""
    from go_map_reduce_spark.registry import track_cache

    qs = [i / PARETO_BINS for i in range(1, PARETO_BINS)]
    # persisted because BOTH the edge aggregate and the bin assignment
    # consume it — without the cache the whole orders scan+aggregate
    # runs twice per invocation (round-11 review finding)
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .persist()
        .transform(track_cache)
    )
    edges = rev.agg(F.percentile("cents", F.lit(qs)).alias("e"))
    # consumed twice (per-bin offsets + the ranked output): persist so
    # the bin assignment runs once
    binned = (
        rev.crossJoin(F.broadcast(edges))
        .select(
            "o_custkey",
            "cents",
            # bin 1 = richest: count edges strictly ABOVE my cents
            (1 + F.size(F.filter("e", lambda x: x > F.col("cents")))).alias(
                "bin"
            ),
        )
        .persist()
        .transform(track_cache)
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("c"), F.sum("cents").alias("s")
    )
    tiny = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bin.select(
        "bin",
        F.coalesce(F.sum("c").over(tiny), F.lit(0)).alias("rk_off"),
        F.coalesce(F.sum("s").over(tiny), F.lit(0)).alias("cum_off"),
        F.sum("s").over(Window.partitionBy()).alias("total"),
    )
    intra = Window.partitionBy("bin").orderBy(F.desc("cents"), F.asc("o_custkey"))
    ranked = (
        binned.join(F.broadcast(offsets), "bin")
        .select(
            "o_custkey",
            "cents",
            "total",
            (F.col("rk_off") + F.row_number().over(intra)).alias("rk"),
            (
                F.col("cum_off")
                + F.sum("cents").over(
                    intra.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).alias("cum"),
        )
    )
    return ranked.where(
        (F.col("cum") - F.col("cents")) * 2 < F.col("total")
    ).select(
        "o_custkey",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("rk").cast("long").alias("rk"),
        (F.col("cum").cast("double") / F.col("total")).alias("cum_share"),
    )


@query(
    "chi2_lang_source",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, SUM(n) AS n_lang FROM o GROUP BY lang),
    ct AS (SELECT source, SUM(n) AS n_source FROM o GROUP BY source),
    t AS (SELECT SUM(n) AS n_total FROM o),
    cells AS (
      SELECT o.lang, o.source, o.n,
             (CAST(n_lang AS DOUBLE) * n_source) / n_total AS expected
      FROM o JOIN rt ON o.lang = rt.lang
             JOIN ct ON o.source = ct.source
             CROSS JOIN t
    ),
    terms AS (
      SELECT (CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
               / expected AS term
      FROM cells
    ),
    dims AS (
      SELECT (SELECT COUNT(*) FROM rt) AS n_rows,
             (SELECT COUNT(*) FROM ct) AS n_cols
    )
    SELECT CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE) AS chi2,
           (SELECT CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) FROM dims) AS dof,
           (SELECT CAST(n_total AS BIGINT) FROM t) AS n_total
    FROM terms
    """,
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the documents lang × source
    contingency table — the mixture-health check (is provenance
    independent of language?) run before rebalancing a pretraining mix.

    Scale: ONE aggregation over the corpus builds the contingency cells
    (|langs|·|sources| rows); the row/column marginals re-aggregate from
    that tiny frame and broadcast back — the raw table is scanned once.
    Expected counts and per-cell (O−E)²/E are fixed-order IEEE doubles
    from exact integer marginals, summed exactly at scale 9 (dsum), so
    the statistic is bit-identical across engines and partitionings."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    o = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rt = o.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    ct = o.groupBy("source").agg(F.sum("n").alias("n_source"))
    t = o.agg(F.sum("n").alias("n_total"))
    expected = (
        F.col("n_lang").cast("double") * F.col("n_source")
    ) / F.col("n_total")
    term = (
        (F.col("n").cast("double") - expected)
        * (F.col("n").cast("double") - expected)
        / expected
    )
    cells = (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(t))
    )
    n_rows = rt.agg(F.count(F.lit(1)).alias("n_rows"))
    n_cols = ct.agg(F.count(F.lit(1)).alias("n_cols"))
    return (
        cells.agg(
            dsum(term, 9).alias("chi2"),
            F.max("n_total").cast("long").alias("n_total"),
        )
        .crossJoin(F.broadcast(n_rows))
        .crossJoin(F.broadcast(n_cols))
        .select(
            "chi2",
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
            .cast("long")
            .alias("dof"),
            "n_total",
        )
    )
