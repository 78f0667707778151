"""Analytics extensions: pivot, cube, exact quantiles, approximate sketches.

Rounding out the SURVEY.md §2c aggregation row: multi-dimensional
aggregation (CUBE), reshaping (PIVOT), holistic aggregates (exact
percentiles — matched bit-for-bit against DuckDB's quantile_cont), and
the approximate/sketch tier (HLL++ distinct counts, GK quantile
sketches). Sketch results are implementation-defined by design, so those
two queries carry no SQL oracle (driver records the weaker rows-only
check); their accuracy contract is pinned by tests instead
(tests/test_analytics.py asserts ≤2% error vs exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query


@query(
    "pivot_segment_status",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS finished_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS pending_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order totals per market segment, one column per status.
    Values list is explicit (O/F/P) so the plan needs no distinct-values
    pre-pass — at scale an implicit pivot is two jobs, an explicit one is
    one. Compiled to conditional aggregates, same as the oracle's
    CASE-sums."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )
    return piv.select(
        "c_mktsegment",
        F.col("O").alias("open_total"),
        F.col("F").alias("finished_total"),
        F.col("P").alias("pending_total"),
    )


@query(
    "cube_year_status",
    oracle=f"""
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
           coalesce(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE(year(o_orderdate), o_orderstatus)
    """,
)
def cube_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, status): all four grouping combinations in one
    pass (Catalyst expands grouping sets; partial aggregation applies to
    each). NULL group markers surfaced as 'ALL'."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube(F.year("o_orderdate").alias("_yr"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce(F.col("_yr").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
    )


@query(
    "grouping_sets_order_stats",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither ROLLUP nor CUBE): per-status
    totals, per-priority totals, and a grand total in ONE pass — Catalyst
    expands the sets into a single Expand + partial-aggregate plan, so
    the fact table is scanned once instead of three times. grouping_id
    disambiguates which set produced each row (a real NULL group value
    vs. the 'not grouped on this column' marker)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )


@query(
    "quantity_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.75) AS price_p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (holistic aggregate): Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition and
    match bit-for-bit. Exact percentile sorts each group — use the
    sketch variant (approx_quantiles_sketch) when groups are huge."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("price_p25"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("price_p75"),
    )


def _approx_distinct_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch + exact twin frame (approx_* AND exact_* columns) —
    the accuracy tests read the raw estimates from here.

    The sketch and exact sides are DELIBERATELY separate aggregations
    joined on the group key: mixing approx_count_distinct with exact
    count_distinct in one Aggregate makes Spark plan the multi-distinct
    Expand strategy, whose partial groups are (key, distinct-value)
    pairs — so every rsd=0.01 HLL buffer (2^14 registers) is allocated
    per DISTINCT VALUE partial group, not per group: measured 89 s vs
    5 s at sf0.1 for identical output (found the first time the bench
    forced full column computation — count-mode had pruned the
    measures for nine rounds; PERFORMANCE.md r09)."""
    li = load_table(spark, sf_dir, "lineitem")
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    return hll.join(exact, "l_returnflag").select(
        "l_returnflag",
        "approx_orders",
        "exact_orders",
        "approx_parts",
        "exact_parts",
    )


@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_2pct,
           TRUE AS parts_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per returnflag, gated by a
    BOUNDED oracle (r12 verdict task 7): the HLL estimate itself is
    implementation-defined (DuckDB cannot replay it), but the exact
    side and the accuracy CONTRACT are oracle-expressible — the query
    emits the exact counts plus within-2%-of-exact booleans computed
    FROM the estimates, and the oracle asserts the exact counts and
    TRUE for every bound.  A sketch regression past its published
    error now fails the hash gate, not just pytest.  Sketches are THE
    100 TB answer for distinct-heavy dashboards: mergeable fixed-size
    state instead of a distinct shuffle.  Raw estimates remain
    available via the _approx_distinct_full frame this composes
    (accuracy tests read them there); plan shape notes live on that
    helper (the Expand-pathology lesson, PERFORMANCE.md r09)."""
    full = _approx_distinct_full(spark, sf_dir)
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e))
        <= 0.02 * F.greatest(F.col(e), F.lit(1))
    )
    return full.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_2pct"),
        within("approx_parts", "exact_parts").alias("parts_within_2pct"),
    )


def _approx_quantiles_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GK-sketch + exact-percentile twin frame (raw estimate AND
    exact median) — the accuracy tests read the raw estimate here."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
    )


@query(
    "approx_quantiles_sketch",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6)
             AS exact_median_price,
           TRUE AS median_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (mergeable sketch, no
    per-group sort), gated by a BOUNDED oracle (the r12 verdict's
    task-7 pattern, extended here to the last quantile rows-only row):
    the GK estimate is implementation-defined, but the exact median
    (the linear-interpolation definition both engines share) and the
    within-2%-of-exact CONTRACT are oracle-expressible.  A sketch
    regression past its published error now fails the hash gate; the
    raw estimate stays available via _approx_quantiles_full (the
    pytest accuracy pin reads it there)."""
    full = _approx_quantiles_full(spark, sf_dir)
    return full.select(
        "l_returnflag",
        F.round("exact_median_price", 6).alias("exact_median_price"),
        (
            F.abs(F.col("approx_median_price") - F.col("exact_median_price"))
            <= 0.02 * F.col("exact_median_price")
        ).alias("median_within_2pct"),
    )


@query(
    "daily_orders_gapfilled",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
             {sql_dsum('o_totalprice')} AS total
      FROM orders GROUP BY 1
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           coalesce(daily.n, 0) AS n, coalesce(daily.total, 0.0) AS total
    FROM days d LEFT JOIN daily ON daily.day = d.day
    """,
)
def daily_orders_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a generated day spine left-joined to daily
    aggregates so order-less days surface as zeros — the time-series
    densification every dashboard needs. The spine is sequence() over
    the min/max bounds (one-row broadcast), cost O(days), not O(rows)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )
    return days.join(daily, "day", "left").select(
        # timestamp_ntz, not date: Spark DATE surfaces as datetime.date in
        # pandas while DuckDB DATE surfaces as datetime64 — a
        # representation-level mismatch under any client-side compare.
        # Midnight timestamps round-trip identically on both engines.
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


@query(
    "rolling_7day_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_7d
    FROM orders
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling window: per-customer trailing-7-day spend via
    a RANGE frame with an interval bound (value-based, so sparse order
    dates work — a ROWS frame would be wrong). Same-timestamp orders are
    frame peers, summed together in exact decimal, so ties stay
    deterministic."""
    from go_map_reduce_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS revenue_7d
        FROM orders
        """
    )


@query(
    "price_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bucket_lo,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by floor-division binning (floor(x/step) is
    a single IEEE op, identical everywhere — width_bucket isn't portable
    to the oracle engine). The aggregation shape behind every
    distribution dashboard: one scan, grouping key = bucket count."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return (
        orders.groupBy(
            bucket.alias("bucket"), (bucket * 50000.0).alias("bucket_lo")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


@query(
    "price_quantity_correlation",
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
             CAST(SUM(qi * qi) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(pi AS DECIMAL(38,0)) * pi) AS DOUBLE) AS syy,
             CAST(SUM(qi * pi) AS DOUBLE) AS sxy
      FROM c GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n,
             n * sxy AS nxy, sx * sy AS xy,
             n * sxx AS nxx, sx * sx AS xx,
             n * syy AS nyy, sy * sy AS yy
      FROM s
    )
    SELECT l_returnflag,
           (nxy - xy) / (sqrt(nxx - xx) * sqrt(nyy - yy)) AS corr_qty_price,
           (nxy - xy) / (CAST(n AS DOUBLE) * n) / 10000.0 AS covar_pop
    FROM m
    """,
)
def price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per returnflag —
    computed from exact-decimal co-moments, NOT the built-in corr():
    built-in co-moment merging is partial-aggregation-order-dependent
    and therefore not reproducible across engines or re-runs; the
    decimal-sum formulation is bit-stable at any parallelism. Same
    single-pass cost (one scan, six sums).

    Both inputs carry 2dp values, so each factor converts to EXACT
    integer cents first (round(v*100): the true product is within 1e-9
    of the integer, one identical IEEE multiply per engine) and every
    co-moment is a pure integer sum — no double→decimal cast of a large
    product anywhere. (The cast route was tried and found to diverge at
    the double's precision edge ~1e10: one row per ~1e5 rounds
    differently between the engines' cast algorithms.) pi² can exceed
    int64 in aggregate, so that one sum rides in DECIMAL(38,0); the
    final decimal→double conversions round identical integers
    identically. corr is scale-invariant; covar is de-scaled by 10^4."""
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
        F.sum(F.col("qi") * F.col("qi")).cast("double").alias("sxx"),
        F.sum(F.col("pi").cast("decimal(38,0)") * F.col("pi"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("qi") * F.col("pi")).cast("double").alias("sxy"),
    )
    # Intermediate products land in their own columns before the
    # subtraction (mirrored in the oracle): a fused multiply-subtract in
    # either engine's codegen would round differently than the two-op
    # sequence, and the comparison is bit-exact.
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
    )
    num = F.col("nxy") - F.col("xy")
    den = F.sqrt(F.col("nxx") - F.col("xx")) * F.sqrt(F.col("nyy") - F.col("yy"))
    return m.select(
        "l_returnflag",
        (num / den).alias("corr_qty_price"),
        (num / (F.col("n").cast("double") * F.col("n")) / 10000.0).alias("covar_pop"),
    )


SAMPLE_FRACTIONS = {"click": 0.5, "view": 0.25, "purchase": 1.0, "signup": 1.0, "error": 0.1}


@query("stratified_sample_events")  # sampling: rows-only check by design
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy with per-stratum fractions, fixed
    seed): downsample noisy event types, keep rare ones — the data-diet
    step of a training pipeline. Sampling has no cross-engine oracle by
    nature (RNG streams differ); determinism under a fixed seed and
    per-stratum rate accuracy are pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    return ev.sampleBy("event_type", fractions=SAMPLE_FRACTIONS, seed=42)


# ~10% keep rate: first 4 md5 hex digits (16 bits) under 6554/65536.
HASH_SAMPLE_THRESHOLD = 6554


@query(
    "deterministic_sample_orders",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                 AS BIGINT) < {HASH_SAMPLE_THRESHOLD}
    )
    SELECT k.o_orderkey, k.o_totalprice, COUNT(l.l_orderkey) AS n_items
    FROM keys k LEFT JOIN lineitem l ON l.l_orderkey = k.o_orderkey
    GROUP BY k.o_orderkey, k.o_totalprice
    """,
)
def deterministic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — the reproducible alternative to RNG
    sampling for training-data diets: keep keys whose md5 prefix falls
    under a threshold. Unlike `sample()`, the decision is a pure
    function of the key, so (a) reruns/retries pick identical rows (no
    RNG stream dependence), and (b) EVERY table keyed by the same entity
    co-samples consistently — here orders and their lineitems stay
    aligned (the join finds every sampled order's items), which seeded
    RNG cannot guarantee across tables. The filter is a per-row
    predicate evaluated at the scan: no shuffle, no state, and the same
    10% lands on every engine (md5 is engine-portable)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    keep = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        < HASH_SAMPLE_THRESHOLD
    )
    keys = orders.where(keep)
    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        keys.join(items, keys.o_orderkey == items.l_orderkey, "left")
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").alias("n_items"))
    )
