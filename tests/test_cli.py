"""CLI end-to-end test (subprocess: the CLI owns its SparkSession
lifecycle, which must not touch the test session)."""

import subprocess
import sys


def test_cli_wordcount(tmp_path):
    (tmp_path / "a.txt").write_text("spark and spark again")
    (tmp_path / "b.txt").write_text("and more spark")
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "go_map_reduce_spark.cli",
            "wc",
            str(tmp_path / "*.txt"),
            str(out),
            "--n-reduce",
            "3",
            "--cpus",
            "4",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = sorted(
        line
        for f in out.glob("part-*")
        for line in f.read_text().splitlines()
        if line
    )
    assert lines == ["again 1", "and 2", "more 1", "spark 3"]
