"""Registry-wide Expand-strategy audit (r09 verdict task 2).

The approx_distinct_sketch pathology hid for nine rounds: a
multi-distinct aggregate plans an Expand (one input replica per
DISTINCT group), and any WIDE-BUFFER aggregate sharing that Aggregate
(HLL++ sketch registers, percentile buffers, collect_list arrays)
materializes its buffer once per (group, distinct-value) partial group
— quadratic state that count-mode benching masked.  This sweep finds
the CLASS mechanically: for every registered query, build its frame
and inspect the physical plan, flagging plans where an Expand feeds an
Aggregate that also carries a wide-buffer aggregate function.  The
INSPECTION is plan-only, but building some queries' frames executes
real work (iterative trainers run their driver argmax rounds, shared
frames eagerly checkpoint on first build, the streaming admit runs its
micro-batches, the bucketed funnel lays its warehouse tables out) —
budget a few minutes at sf0.01, not seconds.

    python tools/expand_sweep.py            # all queries, summary
    python tools/expand_sweep.py -v         # list every Expand user

Exit codes (r10 ADVICE: keep pathology and environment failures
distinguishable): 0 = clean; 1 = a flagged Expand-x-wide-buffer plan
exists (the regression gate tripped on the real pathology); 2 = no
flags but some query's FRAME BUILD errored (environment problem —
missing testdata table, session misconfig — the sweep is incomplete,
not failed-on-pathology).  The companion per-query noop-vs-count
timing ratio lives in BENCH_DETAIL.json (BENCH_ACTION=noop vs count)
and PERFORMANCE.md.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Aggregate functions whose partial-state buffers are large enough that
# per-(group, distinct-value) replication is a scale problem.
WIDE_BUFFER = re.compile(
    r"approx_count_distinct|hllsketch|hll_sketch|approx_percentile"
    r"|percentile|collect_list|collect_set|hll_union",
    re.IGNORECASE,
)


def _expand_under_wide_aggregate(plan: str) -> list[str]:
    """Structural check on the 'simple' plan tree: flag each aggregate
    node that (a) carries a wide-buffer function in its own function
    list and (b) has an Expand in ITS OWN subtree — the exact shape of
    the approx_distinct_sketch pathology.  A sketch aggregate merely
    COEXISTING with an Expand in a sibling subtree (the cc10b99 fix's
    split-and-join shape) is healthy and must not flag.  Subtree scope
    is recovered from the tree rendering: a child prints strictly
    further right than its parent; the subtree ends at the first line
    at or left of the parent's offset."""
    lines = plan.splitlines()
    pos = [len(ln) - len(ln.lstrip(" :+-")) for ln in lines]
    hits = []
    for i, ln in enumerate(lines):
        if "Aggregate" not in ln or not WIDE_BUFFER.search(ln):
            continue
        for j in range(i + 1, len(lines)):
            if pos[j] <= pos[i]:
                break
            if "Expand" in lines[j]:
                hits.extend(sorted(set(WIDE_BUFFER.findall(ln))))
                break
    return sorted(set(hits))


def sweep(verbose: bool = False) -> int:
    from go_map_reduce_spark.registry import QUERIES, release_caches
    from go_map_reduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="expand-sweep")
    expand_users: list[str] = []
    flagged: list[tuple[str, str]] = []
    errors: list[tuple[str, str]] = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            errors.append((name, repr(ex)[:120]))
            continue
        finally:
            release_caches()
        if "Expand" not in plan:
            continue
        expand_users.append(name)
        hits = _expand_under_wide_aggregate(plan)
        if hits:
            flagged.append((name, ",".join(hits)))
    spark.stop()

    print(f"swept {len(QUERIES)} queries at {sf_dir}")
    print(f"expand_users: {len(expand_users)}")
    if verbose:
        for n in expand_users:
            print(f"  Expand: {n}")
    for name, err in errors:
        print(f"  ERROR {name}: {err}")
    if flagged:
        print(f"FLAGGED (Expand x wide-buffer aggregate): {len(flagged)}")
        for name, hits in flagged:
            print(f"  {name}: {hits}")
    else:
        print("FLAGGED: none")
    return _exit_code(flagged, errors)


def _exit_code(flagged: list, errors: list) -> int:
    """0 clean; 1 pathology flagged (dominates); 2 build errors only."""
    if flagged:
        return 1
    return 2 if errors else 0


if __name__ == "__main__":
    sys.exit(sweep(verbose="-v" in sys.argv[1:]))
