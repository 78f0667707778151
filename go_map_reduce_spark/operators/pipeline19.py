"""Round-5 pipeline operators, twelfth batch: watermark sizing
analysis and market-concentration metrics.

`watermark_loss_report` is the batch companion to the streaming
family (streaming/windows.py): before picking a watermark delay, a
deployment replays history and measures what each candidate delay
WOULD have dropped — this query is that replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import sql_dsum
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Watermark sizing: late-data loss per candidate delay
# --------------------------------------------------------------------------

WM_CANDIDATES_S = [60, 300, 900, 3600]


@query(
    "watermark_loss_report",
    oracle=f"""
    WITH arr AS (
      -- deterministic arrival skew: event lands (k mod 600) seconds
      -- after its event time (k from the props payload)
      SELECT event_id, epoch_us(ts) AS ev_us,
             epoch_us(ts)
               + CAST(json_extract(props, '$.k') AS BIGINT) % 600 * 1000000
               AS arr_us
      FROM events
    ),
    maxw AS (
      -- keyed by event_id: two events sharing (arr, ev) must stay two
      SELECT a.event_id, a.ev_us,
             max(a2.ev_us) AS max_ev_seen
      FROM arr a JOIN arr a2 ON a2.arr_us <= a.arr_us
      GROUP BY a.event_id, a.ev_us
    ),
    cand AS (SELECT unnest([{", ".join(str(s) for s in WM_CANDIDATES_S)}]) AS delay_s)
    SELECT CAST(delay_s AS INT) AS delay_s,
           CAST(COUNT(CASE WHEN ev_us < max_ev_seen
                                       - CAST(delay_s AS BIGINT) * 1000000
                           THEN 1 END) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM maxw CROSS JOIN cand
    GROUP BY delay_s
    """,
)
def watermark_loss_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing by replay: for each candidate delay, how many
    events would a streaming job have DROPPED — an event is lost when
    it arrives after the watermark (max event time seen so far, minus
    the delay) has passed its own event time. Arrival order is
    simulated deterministically (event time + k mod 600 s from the
    payload — in production this column is the ingestion timestamp).
    The curve of n_dropped vs delay is exactly how a deployment picks
    `withWatermark` (streaming/windows.py) — completeness bought with
    state size.

    Spark shape: the running max of event time in ARRIVAL order is a
    carry-forward window on the arrival sort (one shuffle; the oracle
    states the same running max as a quadratic join, keeping the
    differential check independent of window machinery); the per-
    candidate counts explode each event onto the 4-row candidate
    frame — bounded fan-out, map-side combinable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.get_json_object("props", "$.k").cast("long") % 600 * 1_000_000
        ).alias("arr_us"),
    )
    from pyspark.sql import Window as W

    # ties in arr_us must see each other's event times (the SQL max
    # over a2.arr_us <= a.arr_us is inclusive of ties): RANGE frame
    wmax = (
        W.orderBy("arr_us").rangeBetween(W.unboundedPreceding, 0)
    )
    watermarked = ev.withColumn("max_ev_seen", F.max("ev_us").over(wmax))
    cand = F.explode(
        F.array(*[F.lit(s) for s in WM_CANDIDATES_S])
    ).alias("delay_s")
    exploded = watermarked.select("ev_us", "max_ev_seen", cand)
    dropped = F.when(
        F.col("ev_us")
        < F.col("max_ev_seen") - F.col("delay_s").cast("long") * 1_000_000,
        1,
    )
    return exploded.groupBy(F.col("delay_s").cast("int").alias("delay_s")).agg(
        F.count(dropped).alias("n_dropped"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Market concentration: HHI per part type
# --------------------------------------------------------------------------

REVENUE = "l_extendedprice * (1.0 - l_discount)"


@query(
    "supplier_concentration_hhi",
    oracle=f"""
    WITH sp AS (
      SELECT p.p_type, l.l_suppkey, {sql_dsum(REVENUE)} AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, l.l_suppkey
    ),
    tot AS (
      SELECT p_type, CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM sp GROUP BY p_type
    )
    SELECT sp.p_type, tot.n_suppliers,
           round({sql_dsum('(sp.rev / tot.total) * (sp.rev / tot.total)', 12)}, 6)
             AS hhi
    FROM sp JOIN tot ON sp.p_type = tot.p_type
    GROUP BY sp.p_type, tot.n_suppliers
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per part type: the sum
    of squared supplier revenue shares — 1/n for a perfectly even
    market, →1 as one supplier dominates. The supply-risk metric a
    procurement pipeline alerts on (same family as
    customer_pareto_share's concentration curve, but a single
    comparable scalar per segment).

    Two grouped decimal aggregates (supplier-level rollup, then the
    per-type total re-aggregated from it — no second fact scan); the
    share squares are per-row IEEE on bit-identical inputs, and their
    sum goes through the decimal discipline too (dsum at scale 12 —
    a double sum over even a few hundred rows is association-ordered
    and would diverge between engines), so the final 6dp HHI is
    bit-identical at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    from go_map_reduce_spark.functions.numeric import dsum

    sp = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "l_suppkey")
        .agg(dsum(rev).alias("rev"))
    )
    tot = sp.groupBy("p_type").agg(
        F.sum(F.col("rev").cast("decimal(38,6)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("rev") / F.col("total")
    return (
        sp.join(F.broadcast(tot), "p_type")
        .groupBy("p_type", "n_suppliers")
        .agg(F.round(dsum(share * share, 12), 6).alias("hhi"))
    )
