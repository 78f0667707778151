"""bench.py stdout contract: the round driver tail-captures stdout and
parses ONE JSON line with fixed keys — pin that shape end-to-end
(subprocess, vanilla environment) so a refactor can't silently break
the driver's BENCH_r{N} parse the way round 1's full-map overflow did."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_parseable_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_QUERIES="wordcount,q1_pricing_summary",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd=HERE,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "sum_query_seconds"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert payload["sf"] == 0.001
    assert payload["n_queries"] == 2
    assert set(payload["queries"]) <= {"wordcount", "q1_pricing_summary"}
    # the full map lands in BENCH_DETAIL.json next to bench.py
    detail = json.load(open(os.path.join(HERE, "BENCH_DETAIL.json")))
    assert set(detail["queries"]) == {"wordcount", "q1_pricing_summary"}
    # keep the repo artifact at its committed full-suite state
    subprocess.run(
        ["git", "-C", HERE, "checkout", "--", "BENCH_DETAIL.json"],
        check=False,
        capture_output=True,
    )
