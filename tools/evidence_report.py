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

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as gate  # noqa: E402
from go_map_reduce_spark.registry import ORACLES, QUERIES  # noqa: E402


def _round_of(path: str) -> int:
    """Numeric round of a CORRECTNESS artifact (lexicographic sort would
    put r10 before r2 from round 10 onward)."""
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _latest_artifact() -> dict:
    latest: dict = {}
    for path in sorted(
        glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")), key=_round_of
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            rows_only = (
                row.get("err") == "no_oracle"
                and isinstance(row.get("spark_rows"), int)
                and row["spark_rows"] > 0
            )
            if green or rows_only:
                latest[name] = os.path.basename(path)
    return latest


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
