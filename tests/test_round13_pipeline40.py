"""Round-13 extension batch: per-source funnel, capped-mixture
water-filling, k-anonymity release — oracle differentials plus the
semantics the oracle can't express (closed form == iterative fixed
point, conservation, reconciliation with the e2e funnel, suppression
accounting, tie-break determinism)."""

import math

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.operators.pipeline40 import (
    CAP,
    K_ANON,
    VOL_BAND_DIV,
    kanon_cohorts,
    kanon_release,
    waterfill_alloc,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_funnel_by_source_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["curation_funnel_by_source"](spark, sf_dir),
        ORACLES["curation_funnel_by_source"],
        sf_dir,
    )


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_waterfill_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["mixture_cap_waterfill"](spark, sf_dir),
        ORACLES["mixture_cap_waterfill"],
        sf_dir,
    )


def test_kanonymity_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["kanonymity_cohort_release"](spark, sf_dir),
        ORACLES["kanonymity_cohort_release"],
        sf_dir,
    )


def test_funnel_by_source_telescopes_and_reconciles(spark, sf_dir):
    """Per source: docs_in = gate + dedup + media + kept (the
    first-failing-stage attribution telescopes); summed over sources
    every stage count equals the e2e funnel's sum over splits — both
    aggregate the SAME staged decision frame, so the two views cannot
    disagree about what the pipeline did."""
    by_src = QUERIES["curation_funnel_by_source"](spark, sf_dir).toPandas()
    assert len(by_src) > 1
    lhs = by_src["docs_in"]
    rhs = (
        by_src["gate_dropped"]
        + by_src["dedup_dropped"]
        + by_src["media_dropped"]
        + by_src["docs_kept"]
    )
    assert (lhs == rhs).all()

    e2e = QUERIES["curation_pipeline_e2e"](spark, sf_dir).toPandas()
    for col in (
        "docs_in",
        "gate_dropped",
        "dedup_dropped",
        "media_dropped",
        "tokens_kept",
    ):
        if col in e2e.columns:
            assert int(by_src[col].sum()) == int(e2e[col].sum()), col

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert int(by_src["docs_in"].sum()) == n_docs


def _iterative_waterfill(toks: dict, target_mult: int, cap: int):
    """Reference implementation: clamp over-cap sources and
    redistribute until the fixed point.  Returns (alloc dict, rounds,
    capped set)."""
    budget = target_mult * sum(toks.values())
    capped: set = set()
    rounds = 0
    while True:
        free = {s: t for s, t in toks.items() if s not in capped}
        left = budget - cap * sum(toks[s] for s in capped)
        wsum = sum(math.sqrt(t) for t in free.values())
        if not free:
            break
        lam = left / wsum
        newly = [s for s, t in free.items() if lam * math.sqrt(t) > cap * t]
        if not newly:
            break
        capped.update(newly)
        rounds += 1
    alloc = {
        s: (cap * t if s in capped else lam * math.sqrt(t))
        for s, t in toks.items()
    }
    return alloc, rounds, capped


def _run_waterfill(spark, toks: dict, target_mult: int, cap: int):
    per_src = spark.createDataFrame(
        [(s, int(t)) for s, t in toks.items()], "source string, tokens_kept long"
    )
    return {
        r["source"]: r.asDict()
        for r in waterfill_alloc(per_src, target_mult, cap).collect()
    }


@pytest.mark.parametrize(
    "toks,target_mult,cap,want_rounds",
    [
        # no cap binds: everything fits under a generous cap
        ({"a": 100, "b": 400, "c": 900}, 3, 100, 0),
        # single round: tiny sources cap, the big one absorbs
        ({"a": 16, "b": 10_000}, 3, 4, 1),
        # CASCADE: capping a frees enough budget to push the waterline
        # past b's cap in the SECOND round (derivation in-line: lam0 ~
        # 23574 < r_b ~ 25298 < lam1 ~ 25483)
        ({"a": 4_000_000, "b": 40_000_000, "c": 100_000_000}, 3, 4, 2),
        # TIED token masses: the (tokens, source) ordering tie-breaks
        # deterministically and the tied pair caps (or not) together
        ({"a": 100, "b": 100, "c": 10_000}, 3, 4, 1),
    ],
)
def test_waterfill_equals_iterative_fixed_point(
    spark, toks, target_mult, cap, want_rounds
):
    """The closed form must equal the clamp-and-redistribute fixed
    point on synthetic frames covering zero/one/two redistribution
    rounds — the cascade case is the one a single-pass clamp gets
    wrong."""
    ref, rounds, capped = _iterative_waterfill(toks, target_mult, cap)
    assert rounds == want_rounds  # the case really exercises its shape
    got = _run_waterfill(spark, toks, target_mult, cap)
    assert set(got) == set(toks)
    for s, row in got.items():
        assert row["capped"] == (s in capped), s
        assert row["alloc_tokens"] == pytest.approx(ref[s], rel=1e-9), s
    budget = target_mult * sum(toks.values())
    assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(
        budget, rel=1e-9
    )


def test_waterfill_infeasible_all_cap(spark):
    """Budget beyond cap * total: every source caps and the shortfall
    is visible as sum(alloc) < budget — no division blow-up, no
    negative waterline."""
    toks = {"a": 100, "b": 900}
    got = _run_waterfill(spark, toks, target_mult=6, cap=4)
    assert all(r["capped"] for r in got.values())
    assert all(r["epochs_final"] == pytest.approx(4.0) for r in got.values())
    assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(
        4 * 1000
    )


def test_waterfill_registered_invariants(spark, sf_dir):
    """On the real corpus: allocations conserve the budget, capped
    rows sit exactly at the cap, uncapped strictly below, the capped
    set is a token-mass prefix, every over_cap source of the uncapped
    plan is capped here, and uncapped sources only GAIN epochs from
    the redistribution."""
    out = QUERIES["mixture_cap_waterfill"](spark, sf_dir).toPandas()
    assert len(out) > 1
    assert out["capped"].any() and (~out["capped"]).any()

    budget = 3 * int(out["tokens_kept"].sum())
    assert out["alloc_tokens"].sum() == pytest.approx(budget, rel=1e-6)
    capped = out[out["capped"]]
    uncapped = out[~out["capped"]]
    assert capped["epochs_final"].tolist() == pytest.approx(
        [float(CAP)] * len(capped)
    )
    assert (uncapped["epochs_final"] < CAP).all()
    assert capped["tokens_kept"].max() <= uncapped["tokens_kept"].min()
    assert (uncapped["epochs_final"] >= uncapped["uncapped_epochs"] - 1e-9).all()

    plan = QUERIES["source_mixture_plan"](spark, sf_dir).toPandas()
    j = out.merge(plan[["source", "over_cap", "planned_epochs"]], on="source")
    assert len(j) == len(out)
    assert (j[j["over_cap"]]["capped"]).all(), "an over_cap source escaped"
    # the two queries' uncapped-plan columns are the same number
    assert j["uncapped_epochs"].tolist() == pytest.approx(
        j["planned_epochs"].tolist(), abs=2e-6
    )


def test_kanonymity_release_accounting(spark, sf_dir):
    """Every released cohort holds >= K users; released + suppressed
    account for every user and every event exactly once; the
    suppressed sentinel is present iff something was suppressed."""
    out = QUERIES["kanonymity_cohort_release"](spark, sf_dir).toPandas()
    rel = out[out["released"]]
    sup = out[~out["released"]]
    assert (rel["n_users"] >= K_ANON).all()
    assert len(sup) <= 1
    if len(sup):
        assert sup.iloc[0]["vol_band"] == -1
        assert sup.iloc[0]["top_type"] == "*"

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert int(out["n_users"].sum()) == n_users
    assert int(out["n_events"].sum()) == n_events


def test_kanonymity_tiebreak_and_bands(spark):
    """Through the production cascade on a synthetic frame: modal-type
    ties break (count desc, type asc); the volume band is
    floor(n_events / div); a singleton cohort suppresses while a
    K-sized cohort releases."""
    rows = []
    # users 0..4: identical profile (8 events, modal 'b') -> released
    for u in range(5):
        rows += [(u, "b", 10)] * 5 + [(u, "a", 10)] * 3
    # user 9: tie 2x'z' vs 2x'c' -> modal 'c' (count desc, type asc);
    # 4 events -> band 0; singleton cohort -> suppressed
    rows += [(9, "z", 1), (9, "z", 1), (9, "c", 1), (9, "c", 1)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, cents long"
    )
    cohorts = {
        (r["vol_band"], r["top_type"]): r.asDict()
        for r in kanon_cohorts(ev).collect()
    }
    assert set(cohorts) == {(8 // VOL_BAND_DIV, "b"), (4 // VOL_BAND_DIV, "c")}
    assert cohorts[(1, "b")]["n_users"] == 5
    assert cohorts[(0, "c")]["n_users"] == 1

    out = kanon_release(kanon_cohorts(ev)).collect()
    rel = [r for r in out if r["released"]]
    sup = [r for r in out if not r["released"]]
    assert len(rel) == 1 and rel[0]["top_type"] == "b"
    assert rel[0]["n_users"] == 5 and rel[0]["n_events"] == 40
    assert len(sup) == 1 and sup[0]["n_users"] == 1
    assert sup[0]["vol_band"] == -1 and sup[0]["top_type"] == "*"
    assert sup[0]["value_cents"] == 4


def test_kanonymity_no_suppression_row_when_nothing_suppressed(spark):
    """The sentinel row is evidence of suppression, not a fixture: a
    corpus where every cohort clears K emits no sentinel."""
    rows = [(u, "a", 1) for u in range(K_ANON) for _ in range(3)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, cents long"
    )
    out = kanon_release(kanon_cohorts(ev)).collect()
    assert len(out) == 1 and out[0]["released"]
    assert out[0]["n_users"] == K_ANON


def test_dialog_corpus_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["session_dialog_corpus"](spark, sf_dir),
        ORACLES["session_dialog_corpus"],
        sf_dir,
    )


def test_dialog_corpus_partitions_events(spark, sf_dir):
    """Every event lands in exactly one document (sessions are
    disjoint per user), the documents are exactly the registered
    sessionization's sessions, and the serialized transcript carries
    exactly n_turns turns."""
    out = QUERIES["session_dialog_corpus"](spark, sf_dir).toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert int(out["n_turns"].sum()) == n_events

    sessions = QUERIES["user_sessions"](spark, sf_dir).toPandas()
    assert len(out) == len(sessions)
    got = set(zip(out["user_id"], out["session_id"]))
    want = set(zip(sessions["user_id"], sessions["session_id"]))
    assert got == want
    j = out.merge(sessions, on=["user_id", "session_id"])
    assert (j["n_turns"] == j["n_events"]).all()

    assert (out["text"].str.count(r" \| ") + 1 == out["n_turns"]).all()
    assert (out["text"].str.len() == out["n_chars"]).all()


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_epoch_schedule_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["mixture_epoch_schedule"](spark, sf_dir),
        ORACLES["mixture_epoch_schedule"],
        sf_dir,
    )


def test_epoch_schedule_realizes_the_waterfill(spark, sf_dir):
    """The schedule is the plan made executable: per source the pass
    fractions sum to epochs_final, epochs are contiguous from 1, all
    but at most the last pass are full, and the per-pass token quotas
    re-sum to the source's allocation (row-rounding tolerance)."""
    sched = QUERIES["mixture_epoch_schedule"](spark, sf_dir).toPandas()
    plan = QUERIES["mixture_cap_waterfill"](spark, sf_dir).toPandas()
    assert set(sched["source"]) == set(plan["source"])
    by_src = sched.groupby("source")
    for src, g in by_src:
        row = plan[plan["source"] == src].iloc[0]
        g = g.sort_values("epoch_idx")
        assert g["epoch_idx"].tolist() == list(range(1, len(g) + 1)), src
        assert g["pass_fraction"].sum() == pytest.approx(
            row["epochs_final"], abs=len(g) * 1e-6
        ), src
        assert (g["pass_fraction"].iloc[:-1] == 1.0).all(), src
        assert 0 < g["pass_fraction"].iloc[-1] <= 1.0, src
        assert g["tokens_this_pass"].sum() == pytest.approx(
            row["alloc_tokens"], abs=len(g)
        ), src
    # capped sources run exactly CAP full epochs, no partial pass
    for src in plan[plan["capped"]]["source"]:
        g = by_src.get_group(src)
        assert len(g) == CAP and (g["pass_fraction"] == 1.0).all(), src


def test_waterfill_random_frames_match_iterative(spark):
    """Seeded-random differential: eight arbitrary source-mass frames
    (skewed magnitudes, near-boundary cap pressure) through the Spark
    closed form vs the python iterative fixed point — the property
    pin that the three hand-built cases generalize."""
    import random

    rng = random.Random(13)
    for case in range(8):
        n = rng.randint(1, 12)
        toks = {
            f"s{i:02d}": rng.choice(
                [rng.randint(1, 50), rng.randint(100, 5000),
                 rng.randint(10_000, 5_000_000)]
            )
            for i in range(n)
        }
        cap = rng.choice([2, 4, 8])
        mult = rng.randint(1, cap - 1) if cap > 1 else 1
        ref, _rounds, capped = _iterative_waterfill(toks, mult, cap)
        got = _run_waterfill(spark, toks, mult, cap)
        assert set(got) == set(toks), case
        for s, row in got.items():
            assert row["capped"] == (s in capped), (case, s, toks)
            assert row["alloc_tokens"] == pytest.approx(
                ref[s], rel=1e-6, abs=1e-6
            ), (case, s, toks)
        budget = mult * sum(toks.values())
        assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(
            budget, rel=1e-6
        ), (case, toks)


def test_kanon_cascade_random_frame_matches_python(spark):
    """Seeded-random differential for the whole QI cascade: 150 users
    with 1-12 events each (ties in per-type counts are frequent at
    this density) through kanon_cohorts vs a python reference of the
    registered semantics — modal type by (count desc, type asc), band
    = n_events // div, exact cohort sums."""
    import random
    from collections import Counter, defaultdict

    rng = random.Random(40)
    rows = []
    for u in range(150):
        for _ in range(rng.randint(1, 12)):
            rows.append(
                (u, rng.choice(["a", "b", "c", "d", "e"]), rng.randint(-50, 500))
            )
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, cents long"
    )
    got = {
        (r["vol_band"], r["top_type"]): (
            r["n_users"],
            r["n_events"],
            r["value_cents"],
        )
        for r in kanon_cohorts(ev).collect()
    }

    per_user_types: dict = defaultdict(Counter)
    per_user_cents: dict = defaultdict(int)
    for u, t, c in rows:
        per_user_types[u][t] += 1
        per_user_cents[u] += c
    want: dict = defaultdict(lambda: [0, 0, 0])
    for u, counts in per_user_types.items():
        n_ev = sum(counts.values())
        top = min(counts, key=lambda t: (-counts[t], t))
        key = (n_ev // VOL_BAND_DIV, top)
        want[key][0] += 1
        want[key][1] += n_ev
        want[key][2] += per_user_cents[u]
    assert got == {k: tuple(v) for k, v in want.items()}
    # ties really occurred (the draw would be vacuous otherwise)
    assert any(
        len({c for c in counts.values()}) < len(counts)
        for counts in per_user_types.values()
    )


def test_epoch_rows_zero_epoch_source_emits_nothing(spark):
    """The degenerate edge the oracle twin forces: a source whose
    epochs_final rounds to 0.0 must emit NO pass rows (DuckDB's
    generate_series(1,0) is empty; a bare Spark sequence(1,0) would
    infer step -1 and emit two rows — the guarded explode must not)."""
    from go_map_reduce_spark.operators.pipeline40 import epoch_rows

    alloc = spark.createDataFrame(
        [("dead", 10_000_000, 0.0), ("live", 100, 2.5)],
        "source string, tokens_kept long, epochs_final double",
    )
    rows = epoch_rows(alloc).collect()
    assert {r["source"] for r in rows} == {"live"}
    live = sorted(
        (r["epoch_idx"], r["pass_fraction"]) for r in rows
    )
    assert live == [(1, 1.0), (2, 1.0), (3, 0.5)]


def test_waterfill_zero_mass_source_dropped_not_divide_by_zero(spark):
    """r13 ADVICE: a source whose kept docs net to zero tokens used to
    throw DIVIDE_BY_ZERO under the session's ANSI mode (epochs columns
    divide by tokens_kept) and its sqrt(0) weight degenerated the
    waterline.  It must be silently excluded — nothing to allocate —
    and the remaining sources must see exactly the budget computed
    over the remaining mass."""
    got = _run_waterfill(
        spark, {"a": 0, "b": 100, "c": 900}, target_mult=3, cap=100
    )
    assert set(got) == {"b", "c"}
    budget = 3 * 1000
    assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(
        budget, rel=1e-9
    )


def test_waterfill_boundary_tolerance_no_silent_fallback(spark):
    """r13 ADVICE: a waterline that lands EXACTLY on a cap boundary
    must still pick a valid candidate (epsilon-tolerant interval
    check), never the all-capped fallback (kstar=n, lam=0) that
    under-allocates a feasible budget.  Constructed exact case:
    toks {1, 4}, cap 5, budget 15 -> lam = (15-5)/2 = 5.0 == r_a ==
    lam0 = 15/3.  At the exact boundary the kstar=0 and kstar=1
    parameterizations give IDENTICAL allocations (a sits exactly at
    cap either way — here via the lam0<=rmin branch, so capped=False
    with epochs_final==cap), so the pin is on the allocation values:
    the full budget is placed, not the fallback's cap*total."""
    got = _run_waterfill(spark, {"a": 1, "b": 4}, target_mult=3, cap=5)
    assert got["a"]["epochs_final"] == pytest.approx(5.0)  # at cap exactly
    assert got["b"]["capped"] is False
    assert got["a"]["alloc_tokens"] == pytest.approx(5.0)
    assert got["b"]["alloc_tokens"] == pytest.approx(10.0)
    assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(15.0)
