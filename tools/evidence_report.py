"""Print the gate's evidence ledger: per-query valid / stale /
never-evidenced status, the round each query's latest evidence comes
from, and the exact upcoming 50-row window — the planning view a
round starts from.

    python tools/evidence_report.py            # summary + window
    python tools/evidence_report.py --full     # every query's row

Reads the same CORRECTNESS_r*.json artifacts and per-function
staleness closures the gate itself uses (__spark_entry__._evidenced),
so the report can't drift from the scheduler."""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as gate  # noqa: E402
from go_map_reduce_spark.registry import ORACLES, QUERIES  # noqa: E402


def _latest_artifact() -> dict:
    """name → latest evidence artifact, straight from the gate's own
    cached scan (__spark_entry__._latest_evidence) so the report's
    evidence-selection rule cannot drift from the scheduler's — this
    file once duplicated that logic and both copies had to be fixed
    for the same r10-lexicographic-sort bug."""
    return dict(gate._latest_evidence())


def main() -> None:
    valid, stale = gate._evidenced()
    latest = _latest_artifact()
    never = [n for n in QUERIES if n not in valid and n not in stale]
    window = list(gate.queries())[:50]

    print(
        f"registered {len(QUERIES)}  oracled {len(ORACLES)}  "
        f"valid {len(valid)}  stale {len(stale)}  never {len(never)}"
    )
    n_new = sum(1 for n in window if n in never)
    n_stale = sum(1 for n in window if n in stale)
    print(
        f"window: {n_new} never-evidenced + {n_stale} stale + "
        f"{len(window) - n_new - n_stale} bonus re-gates"
    )

    def _tag(name: str) -> str:
        if name in never:
            return "NEVER"
        art = latest.get(name, "?")
        round_ = art.replace("CORRECTNESS_", "").replace(".json", "")
        return f"stale@{round_}" if name in stale else f"valid@{round_}"

    print("\n-- upcoming window --")
    for i, name in enumerate(window):
        print(f"{i:3d} {_tag(name):12s} {name}")

    if "--full" in sys.argv:
        print("\n-- full registry --")
        for name in QUERIES:
            oracle = "oracle" if name in ORACLES else "rows-only"
            print(f"{_tag(name):12s} {oracle:9s} {name}")


if __name__ == "__main__":
    main()
