"""Round-13 extension batch: per-source funnel attribution, the capped
mixture (water-filling), and k-anonymity cohort release.

Three operators a production training-data pipeline reads right after
the ones this repo already ships:

- ``curation_funnel_by_source``: the staged funnel re-attributed per
  SOURCE instead of per split — "which crawl is dedup eating" is the
  first question after the per-split funnel says something shrank.
  Same first-failing-stage discipline (gate → dedup → media), same
  one staged decision frame.

- ``mixture_cap_waterfill``: ``source_mixture_plan`` (pipeline39)
  FLAGS sources whose temperature share replays them past the
  memorization cap; this operator FIXES the plan — clamp every
  flagged source at the cap and redistribute the freed token budget
  among the uncapped sources in proportion to their temperature
  weights, repeated to the fixed point.  That fixed point is
  water-filling and has a closed form: allocation_s =
  min(λ·w_s, cap·tok_s) with the unique λ making the allocations sum
  to the budget.  Since w_s = sqrt(tok_s), the capping order is
  simply ascending token mass, so λ falls out of ONE pass over the
  source list sorted by (tokens, source): prefix-sum the capped mass
  and the remaining weight, and pick the smallest prefix k whose
  candidate λ_k = (budget − capped_k) / weight_left_k is consistent
  (every capped source's waterline r_s = cap·sqrt(tok_s) ≤ λ_k ≤ the
  next source's).  No iteration, no driver loop.

  Float discipline: token masses, the budget, and the capped-mass
  prefix are exact BIGINT arithmetic; sqrt is per-row IEEE
  (correctly rounded, hence bit-identical across engines); the weight
  total and its prefix ride the decimal detour
  (functions/numeric.dsum's cast — summation-order-free), so every
  λ candidate is one IEEE divide of two exactly-determined doubles
  and the engines' comparisons agree bit-for-bit.  Outputs rounded
  6dp (the match_jaccard precedent).

- ``kanonymity_cohort_release``: before user interaction data feeds a
  training pipeline, the release table must not isolate individuals:
  generalize each user to a quasi-identifier cohort (activity volume
  band × modal event type) and release only cohorts with ≥ K users;
  smaller cohorts are suppressed into a single sentinel audit row
  (vol_band −1 / top_type '*') that reports suppression VOLUME, not a
  cohort.  This is the k-anonymity discipline (Sweeney 2002) as one
  groupBy cascade — the data-minimization step GDPR erasure
  (gdpr_erasure_cascade) and PII redaction (pii_redaction) don't
  cover: those remove identifiers, this bounds re-identification by
  cohort size.

100 TB shape: the funnel-by-source is one map-side-combinable
aggregate over the memoized staged frame joined to the narrow
(doc_id, source) projection; the waterfill runs entirely on the
#sources-row planning table (the single-partition window is over a
frame that is tiny BY CONSTRUCTION — per-source aggregates — not a
corpus sort); the k-anonymity cascade is two map-side-combinable
aggregates on the natural user keys and one tiny cohort aggregate —
no window over the corpus, no skew (user activity is bounded).

Reference anchor: the wc/indexer per-key aggregation
(mrapps/wc.go:21-44, mrapps/indexer.go:21-26) is the execution shape
of all three; the funnel/mixture semantics extend the repo's own
pipeline27/39 capstones.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.events import user_sessions
from go_map_reduce_spark.operators.pipeline27 import (
    STAGED_ORACLE,
    staged_decisions,
)
from go_map_reduce_spark.operators.pipeline39 import EPOCH_CAP, TARGET_MULT
from go_map_reduce_spark.registry import ORACLES, query

# The waterfill clamps at pipeline39's flag threshold so "flagged by
# the plan" and "capped by the fix" are the same set; integer so the
# capped mass prefix stays exact BIGINT.
CAP = int(EPOCH_CAP)
assert float(CAP) == EPOCH_CAP, "cap must be integral for exact prefixes"

K_ANON = 5  # minimum cohort size a released row may have
VOL_BAND_DIV = 8  # events-per-user band width (n_events // 8)


# --------------------------------------------------------------------------
# Per-source funnel attribution
# --------------------------------------------------------------------------


@query(
    "curation_funnel_by_source",
    oracle=f"""
    WITH staged AS ({STAGED_ORACLE}),
    j AS (
      SELECT d.source, st.gate_ok, st.dedup_ok, st.media_ok,
             st.n_tokens - st.n_removed AS tok
      FROM staged st JOIN documents d ON d.doc_id = st.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_in,
           CAST(SUM(CASE WHEN NOT gate_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS gate_dropped,
           CAST(SUM(CASE WHEN gate_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS dedup_dropped,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND NOT media_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS media_dropped,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(SUM(CASE WHEN gate_ok AND dedup_ok AND media_ok
                         THEN tok ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM j GROUP BY source
    """,
)
def curation_funnel_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel attributed per SOURCE: docs in, drops per
    first-failing stage (gate → dedup → media — the pipeline27/30
    attribution order), docs and post-cut tokens kept.  The per-split
    funnel (curation_pipeline_e2e) answers "is the pipeline healthy";
    this answers the follow-up — WHICH corpus a stage is eating, the
    view that catches a single crawl full of boilerplate or
    re-uploaded media before it skews the mixture.

    100 TB shape: one aggregate over the memoized staged decision
    frame joined to the narrow (doc_id, source) projection —
    map-side-combinable counts, no window, the same plan class as the
    dataset card's per-split slice."""
    staged = staged_decisions(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    gate, ddp, med = F.col("gate_ok"), F.col("dedup_ok"), F.col("media_ok")
    kept = gate & ddp & med
    return (
        staged.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_in"),
            F.sum((~gate).cast("long")).alias("gate_dropped"),
            F.sum((gate & ~ddp).cast("long")).alias("dedup_dropped"),
            F.sum((gate & ddp & ~med).cast("long")).alias("media_dropped"),
            F.sum(kept.cast("long")).alias("docs_kept"),
            F.sum(
                F.when(kept, F.col("n_tokens") - F.col("n_removed")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("tokens_kept"),
        )
    )


# --------------------------------------------------------------------------
# Capped mixture: water-filling redistribution
# --------------------------------------------------------------------------

# The kept-mass CTE shared with pipeline39's plan — re-stated (not
# imported as SQL) because this oracle additionally needs the windowed
# prefixes; the Spark side reuses staged_decisions, the one decision
# frame, so the two queries cannot disagree about WHAT was kept.
_WF_PER_SRC = f"""
    staged AS ({STAGED_ORACLE}),
    kept AS (
      SELECT d.source, st.n_tokens - st.n_removed AS tok
      FROM staged st JOIN documents d ON d.doc_id = st.doc_id
      WHERE st.gate_ok AND st.dedup_ok AND st.media_ok
    ),
    per_src AS (
      SELECT source, CAST(SUM(tok) AS BIGINT) AS tokens_kept
      FROM kept GROUP BY source
      HAVING SUM(tok) > 0
    )
"""

# The waterline chain shared VERBATIM by the waterfill and the epoch
# schedule oracles (one SQL definition of the closed form, exactly as
# waterfill_alloc is its one Spark definition); the per-row allocation
# expression likewise.  ``chosen`` carries n/total/wtot for the
# waterfill's uncapped-epochs column — unused but harmless when the
# schedule composes the same chain.
_WF_WATERLINE_CTES = f"""
    tot AS (
      SELECT CAST(SUM(tokens_kept) AS BIGINT) AS total,
             SUM(CAST(sqrt(CAST(tokens_kept AS DOUBLE)) AS DECIMAL(38,6)))
               AS wdec,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM per_src
    ),
    ordered AS (
      SELECT source, tokens_kept,
             sqrt(CAST(tokens_kept AS DOUBLE)) AS w,
             {CAP}.0 * sqrt(CAST(tokens_kept AS DOUBLE)) AS r,
             row_number() OVER
               (ORDER BY tokens_kept, source) AS rk,
             SUM({CAP} * tokens_kept) OVER
               (ORDER BY tokens_kept, source
                ROWS UNBOUNDED PRECEDING) AS p,
             SUM(CAST(sqrt(CAST(tokens_kept AS DOUBLE)) AS DECIMAL(38,6)))
               OVER (ORDER BY tokens_kept, source
                     ROWS UNBOUNDED PRECEDING) AS sw,
             lead({CAP}.0 * sqrt(CAST(tokens_kept AS DOUBLE))) OVER
               (ORDER BY tokens_kept, source) AS lead_r
      FROM per_src
    ),
    cand AS (
      SELECT o.rk,
             CAST({TARGET_MULT} * t.total - o.p AS DOUBLE)
               / CAST(t.wdec - o.sw AS DOUBLE) AS lam,
             o.r, o.lead_r
      FROM ordered o, tot t WHERE o.rk < t.n
    ),
    valid AS (
      SELECT rk, lam FROM cand
      WHERE r <= lam + 1e-9 * (abs(r) + abs(lam) + 1.0)
        AND (lead_r IS NULL
             OR lam <= lead_r + 1e-9 * (abs(lead_r) + abs(lam) + 1.0))
    ),
    chosen AS (
      SELECT t.n, t.total, CAST(t.wdec AS DOUBLE) AS wtot,
             CASE WHEN CAST({TARGET_MULT} * t.total AS DOUBLE)
                       / CAST(t.wdec AS DOUBLE)
                       <= (SELECT MIN(r) FROM ordered)
                  THEN 0
                  ELSE COALESCE((SELECT MIN(rk) FROM valid), t.n)
             END AS kstar,
             CASE WHEN CAST({TARGET_MULT} * t.total AS DOUBLE)
                       / CAST(t.wdec AS DOUBLE)
                       <= (SELECT MIN(r) FROM ordered)
                  THEN CAST({TARGET_MULT} * t.total AS DOUBLE)
                       / CAST(t.wdec AS DOUBLE)
                  ELSE COALESCE(
                       (SELECT lam FROM valid
                        WHERE rk = (SELECT MIN(rk) FROM valid)), 0.0)
             END AS lam
      FROM tot t
    )
"""

_WF_ALLOC_SQL = f"""CASE WHEN o.rk <= c.kstar
                      THEN CAST({CAP} * o.tokens_kept AS DOUBLE)
                      ELSE c.lam * o.w END"""


@query(
    "mixture_cap_waterfill",
    oracle=f"""
    WITH {_WF_PER_SRC},
    {_WF_WATERLINE_CTES}
    SELECT o.source, o.tokens_kept,
           round({TARGET_MULT}.0 * c.total * (o.w / c.wtot)
                 / o.tokens_kept, 6) AS uncapped_epochs,
           o.rk <= c.kstar AS capped,
           round({_WF_ALLOC_SQL}, 6) AS alloc_tokens,
           round({_WF_ALLOC_SQL}
                 / CAST(o.tokens_kept AS DOUBLE), 6) AS epochs_final
    FROM ordered o, chosen c
    """,
)
def mixture_cap_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAPPED training mixture: clamp every source whose
    temperature allocation would replay it past {CAP} epochs and
    water-fill the freed budget across the uncapped sources in
    proportion to their sqrt-temperature weights (module docstring
    derives the closed form).  Per source: kept token mass, the
    uncapped plan's epochs (= pipeline39's planned_epochs), whether
    the cap binds, and the final allocation/epochs.  Invariants the
    tests pin: allocations sum to the {TARGET_MULT}x-total budget,
    capped sources sit exactly at {CAP} epochs, uncapped sources
    below it, and capped ⇔ the uncapped plan's over_cap flag whenever
    a single redistribution round suffices (synthetic frames pin the
    cascade case where it doesn't).

    100 TB shape: everything past the per-source aggregate runs on
    the #sources-row planning table — the single-partition window is
    over a deliberately tiny frame (per-source totals), not corpus
    rows; the corpus-side cost is the one map-side-combinable
    aggregate the mixture plan already pays."""
    return waterfill_alloc(kept_tokens_by_source(spark, sf_dir))


def kept_tokens_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, tokens_kept) over the funnel's kept documents — the
    ONE Spark definition of the waterfill/schedule input frame (its
    SQL twin is _WF_PER_SRC), so the two mixture queries cannot
    diverge on what was kept.

    r15: memoized via registry.shared_frame.  The waterfill consumes
    this frame THREE times per query (the ordered projection, the
    totals aggregate, the rmin broadcast) and TWO registered queries
    build on it — without the memo that is six re-runs of
    staged-read → documents-join → aggregate per suite pass for a
    frame of #sources rows.  At 100 TB per-source planning aggregates
    materialize once; the build is billed to the first consumer
    (memo-aware bench reps, r15)."""
    from go_map_reduce_spark.registry import shared_frame

    def _build() -> DataFrame:
        staged = staged_decisions(spark, sf_dir)
        src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        return (
            staged.where("gate_ok AND dedup_ok AND media_ok")
            .join(src, "doc_id")
            .groupBy("source")
            .agg(
                F.sum(F.col("n_tokens") - F.col("n_removed"))
                .cast("long")
                .alias("tokens_kept")
            )
            # A source whose kept docs net to zero tokens has nothing to
            # allocate and would divide-by-zero the epochs columns under
            # ANSI mode (sqrt(0) also degenerates the waterline weights) —
            # drop it here, mirrored by HAVING in _WF_PER_SRC (r13 ADVICE).
            .where(F.col("tokens_kept") > 0)
            .localCheckpoint(eager=True)
        )

    return shared_frame(
        spark, f"wf_per_src:{sf_dir}", _build, data_path=sf_dir
    )


def waterfill_alloc(
    per_src: DataFrame, target_mult: int = TARGET_MULT, cap: int = CAP
) -> DataFrame:
    """The closed-form water-fill over a (source, tokens_kept) frame —
    factored out of the registered query so synthetic frames can pin
    the algorithm (cascade capping, the all-capped infeasible edge,
    equality at the waterline) against an iterative reference.  When
    the budget exceeds cap·total (infeasible), every source caps and
    the shortfall is visible as Σ alloc < budget."""
    # Zero-mass sources cannot receive epochs (and would zero-divide
    # the per-epoch columns / degenerate the sqrt weights): exclude
    # them up front so synthetic frames get the same guard as the
    # registered input (kept_tokens_by_source filters identically).
    per_src = per_src.where(F.col("tokens_kept") > 0)
    w = F.sqrt(F.col("tokens_kept").cast("double"))
    wdec = w.cast("decimal(38,6)")
    tot = per_src.agg(
        F.sum("tokens_kept").cast("long").alias("total"),
        F.sum(wdec).alias("wdec"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ow = W.orderBy("tokens_kept", "source")
    pre = ow.rowsBetween(W.unboundedPreceding, W.currentRow)
    ordered = per_src.select(
        "source",
        "tokens_kept",
        w.alias("w"),
        (F.lit(float(cap)) * w).alias("r"),
        F.row_number().over(ow).alias("rk"),
        F.sum(F.lit(cap) * F.col("tokens_kept")).over(pre).alias("p"),
        F.sum(wdec).over(pre).alias("sw"),
        F.lead(F.lit(float(cap)) * w).over(ow).alias("lead_r"),
    ).crossJoin(F.broadcast(tot))
    budget = F.lit(target_mult) * F.col("total")
    lam_k = (budget - F.col("p")).cast("double") / (
        F.col("wdec") - F.col("sw")
    ).cast("double")
    cand = ordered.where(F.col("rk") < F.col("n")).select(
        "rk",
        lam_k.alias("lam"),
        "r",
        "lead_r",
    )
    # Interval membership is epsilon-tolerant (r13 ADVICE): when the
    # true waterline coincides with a cap boundary, FP rounding can
    # push lam a few ulps outside BOTH adjacent half-open intervals,
    # leaving `valid` empty and silently taking the all-capped
    # fallback (kstar=n, lam=0) — under-allocating a feasible budget.
    # A relative 1e-9 slack readmits the boundary candidate; if the
    # slack admits both neighbours, MIN(rk) picks deterministically
    # and at an exact boundary their allocations agree anyway.  The
    # oracle's WHERE mirrors this expression verbatim.
    tol_lo = F.lit(1e-9) * (F.abs(F.col("r")) + F.abs(F.col("lam")) + F.lit(1.0))
    tol_hi = F.lit(1e-9) * (
        F.abs(F.col("lead_r")) + F.abs(F.col("lam")) + F.lit(1.0)
    )
    valid = cand.where(
        (F.col("r") <= F.col("lam") + tol_lo)
        & (F.col("lead_r").isNull() | (F.col("lam") <= F.col("lead_r") + tol_hi))
    ).agg(
        F.min("rk").alias("vrk"), F.min_by("lam", "rk").alias("vlam")
    )
    lam0 = budget.cast("double") / F.col("wdec").cast("double")
    chosen = (
        tot.crossJoin(
            F.broadcast(per_src.agg(F.min(F.lit(float(cap)) * w).alias("rmin")))
        )
        .crossJoin(F.broadcast(valid))
        .select(
            F.when(lam0 <= F.col("rmin"), F.lit(0))
            .otherwise(F.coalesce("vrk", F.col("n")))
            .cast("long")
            .alias("kstar"),
            F.when(lam0 <= F.col("rmin"), lam0)
            .otherwise(F.coalesce("vlam", F.lit(0.0)))
            .alias("lam"),
        )
    )
    # ordered already carries total/wdec from its own totals cross join,
    # so chosen ships only the waterline (kstar, lam) — no dup columns.
    out = ordered.crossJoin(F.broadcast(chosen))
    capped = F.col("rk") <= F.col("kstar")
    alloc = F.when(
        capped, (F.lit(cap) * F.col("tokens_kept")).cast("double")
    ).otherwise(F.col("lam") * F.col("w"))
    uncapped_epochs = (
        F.lit(float(target_mult))
        * F.col("total").cast("double")
        * (F.col("w") / F.col("wdec").cast("double"))
        / F.col("tokens_kept")
    )
    return out.select(
        "source",
        "tokens_kept",
        F.round(uncapped_epochs, 6).alias("uncapped_epochs"),
        capped.alias("capped"),
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(alloc / F.col("tokens_kept").cast("double"), 6).alias(
            "epochs_final"
        ),
    )


# --------------------------------------------------------------------------
# k-anonymity cohort release
# --------------------------------------------------------------------------


@query(
    "kanonymity_cohort_release",
    oracle=f"""
    WITH tc AS (
      SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt_t,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_t
      FROM events GROUP BY user_id, event_type
    ),
    top AS (
      SELECT user_id, event_type AS top_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt_t DESC, event_type) AS trk
        FROM tc
      ) WHERE trk = 1
    ),
    prof AS (
      SELECT t.user_id,
             CAST(SUM(t.cnt_t) AS BIGINT) AS n_ev,
             CAST(SUM(t.cents_t) AS BIGINT) AS cents,
             MIN(p.top_type) AS top_type
      FROM tc t JOIN top p ON p.user_id = t.user_id
      GROUP BY t.user_id
    ),
    cohort AS (
      SELECT n_ev // {VOL_BAND_DIV} AS vol_band, top_type,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n_ev) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS value_cents
      FROM prof GROUP BY 1, 2
    )
    SELECT CASE WHEN n_users >= {K_ANON} THEN vol_band
                ELSE CAST(-1 AS BIGINT) END AS vol_band,
           CASE WHEN n_users >= {K_ANON} THEN top_type ELSE '*' END
             AS top_type,
           n_users >= {K_ANON} AS released,
           CAST(SUM(n_users) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM cohort GROUP BY 1, 2, 3
    """,
)
def kanonymity_cohort_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymous release of per-user activity: generalize each user
    to the quasi-identifier cohort (volume band = events //
    {VOL_BAND_DIV}, modal event type — ties broken deterministically
    by count desc then type asc), release only cohorts holding ≥
    {K_ANON} users, and fold every smaller cohort into one sentinel
    audit row (vol_band −1, top_type '*', released FALSE) so the
    suppression volume is visible without re-identifying anyone.
    Event values are released as exact integer cents (the
    price_quantity_correlation integer-factor discipline — no float
    aggregate anywhere).

    100 TB shape: two map-side-combinable aggregates on the natural
    (user_id, event_type) / user_id keys — the modal type is a packed
    struct arg-min inside the second, NOT a corpus window — then a
    #cohorts-row aggregate.  User activity is bounded, so no skew
    handling is needed on the user key."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return kanon_release(kanon_cohorts(ev))


def kanon_cohorts(ev: DataFrame) -> DataFrame:
    """QI-cohort aggregate of an (user_id, event_type, cents) frame —
    factored out so synthetic frames can pin the modal tie-break and
    the band arithmetic through the exact production cascade."""
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_t"),
        F.sum("cents").cast("long").alias("cents_t"),
    )
    prof = tc.groupBy("user_id").agg(
        F.sum("cnt_t").cast("long").alias("n_ev"),
        F.sum("cents_t").cast("long").alias("cents"),
        F.min_by(
            "event_type",
            F.struct((-F.col("cnt_t")).alias("a"), F.col("event_type").alias("b")),
        ).alias("top_type"),
    )
    return prof.groupBy(
        (F.col("n_ev") / VOL_BAND_DIV).cast("long").alias("vol_band"),
        "top_type",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("value_cents"),
    )


def kanon_release(cohort: DataFrame) -> DataFrame:
    """Release/suppress as ONE re-aggregation over the tiny cohort
    frame with MASKED quasi-identifiers: a released cohort's masked
    key is itself (the sums are identity), every sub-K cohort maps to
    the (-1, '*') sentinel and merges.  A single pass — the earlier
    union-of-two-filters shape recomputed the corpus cascade once per
    branch — and the sentinel row exists exactly when something
    suppressed, with no HAVING special case.  Released vol_bands are
    ≥ 0 by construction, so the sentinel key cannot collide."""
    rel = F.col("n_users") >= K_ANON
    return cohort.groupBy(
        F.when(rel, F.col("vol_band"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("vol_band"),
        F.when(rel, F.col("top_type")).otherwise(F.lit("*")).alias("top_type"),
        rel.alias("released"),
    ).agg(
        F.sum("n_users").cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    )


# --------------------------------------------------------------------------
# Events → training documents: the sessionized dialog corpus
# --------------------------------------------------------------------------


@query(
    "session_dialog_corpus",
    oracle=f"""
    WITH s AS ({ORACLES["user_sessions"]}),
    j AS (
      SELECT e.user_id, s.session_id, e.ts, e.event_id,
             e.event_type || '@'
               || CAST(CAST(round(e.value * 100) AS BIGINT) AS VARCHAR)
               AS turn
      FROM events e
      JOIN s ON s.user_id = e.user_id
            AND e.ts >= s.session_start AND e.ts <= s.session_end
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           string_agg(turn, ' | ' ORDER BY ts, event_id) AS text,
           CAST(LENGTH(string_agg(turn, ' | ' ORDER BY ts, event_id))
                AS BIGINT) AS n_chars
    FROM j GROUP BY user_id, session_id
    """,
)
def session_dialog_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interaction logs turned into training documents: one document
    per user session (the registered 30-min-gap sessionization),
    its text the time-ordered transcript of ``type@cents`` turns —
    the events→documents bridge a chat-style training corpus is built
    over before it enters the same gate/dedup/packing funnel as
    crawled text.  Event values ride as exact integer cents so the
    serialization is bit-stable across engines.

    Session assignment REUSES the registered user_sessions operator:
    a user's sessions are disjoint-by-construction (>30-min gaps), so
    joining events into [session_start, session_end] on the user key
    recovers the per-event assignment without duplicating the
    lag/running-sum machinery.  Ordering inside a document is pinned
    by (ts, event_id) — the sessionization's own total order.

    100 TB shape: one equality join on user_id (the range predicate
    is a post-join filter on the co-partitioned pair) and one
    aggregate on (user_id, session_id) — the transcript assembly is a
    sorted-struct fold inside the aggregate, no second corpus
    shuffle; per-user data is bounded, so no skew handling."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.col("event_type"),
            F.lit("@"),
            F.round(F.col("value") * 100).cast("long").cast("string"),
        ).alias("turn"),
    )
    sess = user_sessions(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    j = ev.join(sess, "user_id").where(
        (F.col("ts") >= F.col("session_start"))
        & (F.col("ts") <= F.col("session_end"))
    )
    text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "turn"))
            ),
            lambda x: x["turn"],
        ),
        " | ",
    )
    return j.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# Mixture plan → executable per-epoch schedule
# --------------------------------------------------------------------------


@query(
    "mixture_epoch_schedule",
    oracle=f"""
    WITH {_WF_PER_SRC},
    {_WF_WATERLINE_CTES},
    final AS (
      SELECT o.source, o.tokens_kept,
             round({_WF_ALLOC_SQL}
                   / CAST(o.tokens_kept AS DOUBLE), 6) AS epochs_final
      FROM ordered o, chosen c
    )
    SELECT f.source, CAST(g.epoch_idx AS BIGINT) AS epoch_idx,
           round(CASE WHEN g.epoch_idx <= CAST(floor(f.epochs_final) AS BIGINT)
                      THEN 1.0
                      ELSE f.epochs_final - floor(f.epochs_final) END,
                 6) AS pass_fraction,
           CAST(round((CASE WHEN g.epoch_idx
                                 <= CAST(floor(f.epochs_final) AS BIGINT)
                            THEN 1.0
                            ELSE f.epochs_final - floor(f.epochs_final) END)
                      * f.tokens_kept) AS BIGINT) AS tokens_this_pass
    FROM final f,
         LATERAL (SELECT unnest(generate_series(1,
                    CAST(ceil(f.epochs_final) AS BIGINT))) AS epoch_idx) g
    """,
)
def mixture_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped mixture made EXECUTABLE: per source, one row per
    training epoch — full passes (pass_fraction 1.0) for
    floor(epochs_final) epochs and one final partial pass carrying
    the fractional remainder, each with its token quota.  This is the
    table a training-loop data loader actually consumes; summing
    pass_fraction per source recovers epochs_final exactly (pinned),
    so the schedule and the plan cannot drift.

    Built on the same closed-form waterline as mixture_cap_waterfill
    (one definition each side: the Spark side calls waterfill_alloc,
    the oracle re-states the CTE chain); the explode is
    F.sequence/generate_series over ceil(epochs) — a #sources·cap row
    frame, driver-scale."""
    alloc = waterfill_alloc(kept_tokens_by_source(spark, sf_dir)).select(
        "source", "tokens_kept", "epochs_final"
    )
    return epoch_rows(alloc)


def epoch_rows(alloc: DataFrame) -> DataFrame:
    """Explode a (source, tokens_kept, epochs_final) allocation into
    per-epoch pass rows — factored out so the degenerate edge is
    pinnable: when epochs_final rounds to 0.0, Spark's bare
    sequence(1, 0) would INFER step -1 and emit [1, 0] while DuckDB's
    generate_series(1, 0) is empty — a cross-engine row-count
    divergence.  Guarding with an empty array when ceil < 1 makes the
    explode drop the row, matching the oracle exactly."""
    full = F.floor("epochs_final").cast("long")
    n_passes = F.ceil("epochs_final").cast("long")
    sched = alloc.select(
        "source",
        "tokens_kept",
        "epochs_final",
        F.explode(
            F.when(
                n_passes >= 1, F.sequence(F.lit(1).cast("long"), n_passes)
            ).otherwise(F.array().cast("array<long>"))
        ).alias("epoch_idx"),
    )
    frac = F.when(
        F.col("epoch_idx") <= full, F.lit(1.0)
    ).otherwise(F.col("epochs_final") - F.floor("epochs_final"))
    return sched.select(
        "source",
        "epoch_idx",
        F.round(frac, 6).alias("pass_fraction"),
        F.round(frac * F.col("tokens_kept"))
        .cast("long")
        .alias("tokens_this_pass"),
    )
