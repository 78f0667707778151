"""Fault-recovery probe — the reference's crash chaos app (A5,
mrapps/crash.go: workers randomly die mid-task; main/test-mr.sh's crash
test asserts the job still completes with correct output, because the
coordinator re-executes timed-out tasks, mr/coordinator.go:215).

Spark's analog machinery is task re-execution (spark.task.maxFailures).
Local mode defaults to 1 attempt, so the probe runs in a SUBPROCESS with
master local[4,3] (3 attempts per task): every task of the flaky stage
raises on its FIRST attempt (TaskContext.attemptNumber() == 0) and
succeeds on retry — the job must complete with byte-correct results and
the attempt counter must show the re-executions. This is the §2a F13 row
(fault/straggler recovery = Spark scheduler, "no code by design")
upgraded from a design claim to an executed proof."""

import subprocess
import sys

PROBE = r"""
import os, sys, tempfile
from pyspark.sql import SparkSession, functions as F

marker_dir = tempfile.mkdtemp(prefix="crash-markers-")
spark = (
    SparkSession.builder.master("local[4,3]")
    .appName("crash-probe")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
attempts = spark.sparkContext.accumulator(0)


def crash_once(it):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    attempts.add(1)
    # filesystem marker survives the task's death — counts REAL attempts
    open(os.path.join(
        marker_dir, f"p{ctx.partitionId()}-a{ctx.attemptNumber()}"
    ), "w").close()
    if ctx.attemptNumber() == 0:
        raise RuntimeError("injected crash on first attempt")
    for x in it:
        yield x


n = 1000
rdd = spark.sparkContext.parallelize(range(n), 4).mapPartitions(crash_once)
total = rdd.sum()
expected = n * (n - 1) // 2
assert total == expected, f"wrong result after recovery: {total}"
markers = sorted(os.listdir(marker_dir))
# every partition really ran twice: a crashed attempt 0 + a retry
assert len(markers) == 8, f"markers={markers}"
assert all(f"p{p}-a{a}" in markers for p in range(4) for a in (0, 1))
# ...but the ACCUMULATOR counts only successful attempts: Spark discards
# updates from failed tasks — the exactly-once accounting the reference's
# jobcount app exists to check (mrapps/jobcount.go:34-46)
assert attempts.value == 4, f"attempts={attempts.value}"
print("RECOVERED", total, len(markers), attempts.value)
spark.stop()
"""


def test_crash_recovery_first_attempt_fails():
    out = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RECOVERED 499500 8 4" in out.stdout
