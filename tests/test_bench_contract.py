"""bench.py stdout contract: the round driver tail-captures stdout and
parses ONE JSON line with fixed keys — pin that shape end-to-end
(subprocess, vanilla environment) so a refactor can't silently break
the driver's BENCH_r{N} parse the way round 1's full-map overflow did."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_parseable_json_line(tmp_path):
    # Redirect the detail artifact into the test's tmpdir so this run
    # can never clobber the committed full-suite BENCH_DETAIL.json
    # (restoring via `git checkout` would silently discard an
    # uncommitted bench round's results).
    detail_path = tmp_path / "BENCH_DETAIL.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_QUERIES="wordcount,q1_pricing_summary",
        BENCH_DETAIL_PATH=str(detail_path),
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
    # the full map lands at BENCH_DETAIL_PATH
    detail = json.load(open(detail_path))
    assert set(detail["queries"]) == {"wordcount", "q1_pricing_summary"}


def test_noisy_set_names_are_all_registered():
    """Same contract as the gate's priority lists: a typo'd (or later
    renamed) entry in bench.NOISY silently loses its best-of-2
    treatment and re-enters the marathon JIT whipsaw."""
    import bench
    from go_map_reduce_spark.registry import QUERIES

    missing = [n for n in bench.NOISY if n not in QUERIES]
    assert not missing, missing
