"""tools/steal_sample.py: the summarize() arithmetic and the wrapper
contract (exit-code passthrough + one STEAL_SAMPLE line) — the bench
citability protocol (PERFORMANCE.md r13) rests on this line being
present and well-formed."""

import re
import subprocess
import sys

from tools.steal_sample import summarize


def test_summarize_shares():
    # user nice system idle iowait irq softirq steal
    before = (0, 0, 0, 0, 0, 0, 0, 0)
    after = (40, 0, 10, 40, 0, 0, 0, 10)
    s = summarize(before, after)
    assert s["user_pct"] == 40.0
    assert s["system_pct"] == 10.0
    assert s["idle_pct"] == 40.0
    assert s["steal_pct"] == 10.0
    # demand = busy(50) + steal(10): the guest wanted 60, got 50
    assert abs(s["steal_vs_demand_pct"] - 100 * 10 / 60) < 1e-9


def test_summarize_idle_box():
    s = summarize((0,) * 8, (0, 0, 0, 100, 0, 0, 0, 0))
    assert s["steal_pct"] == 0.0
    assert s["steal_vs_demand_pct"] == 0.0


def test_wrapper_passthrough_and_line():
    out = subprocess.run(
        [sys.executable, "tools/steal_sample.py", "--",
         sys.executable, "-c", "print('hi')"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0
    assert "hi" in out.stdout
    lines = [l for l in out.stdout.splitlines() if l.startswith("STEAL_SAMPLE")]
    assert len(lines) == 1
    assert re.search(r"steal_vs_demand=\d+(\.\d+)?%", lines[0])

    rc = subprocess.run(
        [sys.executable, "tools/steal_sample.py", "--",
         sys.executable, "-c", "raise SystemExit(3)"],
        capture_output=True,
        timeout=60,
    ).returncode
    assert rc == 3


def test_vs_demand_suppressed_on_idle_guest():
    """On an idle guest (demand under 2% of capacity) the vs-demand
    ratio is noise (steal ~= demand ~= a few ticks reads ~100%) and
    must report 0 — the absolute steal_pct stays."""
    s = summarize((0,) * 8, (1, 0, 0, 1000, 0, 0, 0, 1))
    assert s["steal_vs_demand_pct"] == 0.0
    assert s["steal_pct"] > 0.0
