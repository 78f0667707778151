"""Execution-probe analogs of the reference's A4/A7/A8 chaos apps
(SURVEY.md §2b): the reference verifies its *machinery* with plugin apps
that count task executions (mrapps/jobcount.go:34-46) and prove map- and
reduce-side parallelism by overlapping task timestamps
(mrapps/mtiming.go:19-62, mrapps/rtiming.go:78-84). Spark's analogs are
accumulators (execution counting) and task wall-clock intervals + the
status tracker (parallelism), probed here through the same parity API
the data apps use."""

import threading
import time

import pytest

from go_map_reduce_spark.parity import run_job_df


@pytest.fixture(scope="module")
def probe_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("probe")
    paths = []
    for i in range(8):
        p = root / f"in-{i}.txt"
        p.write_text(f"file {i} payload\n")
        paths.append(str(p))
    return sorted(paths)


def test_jobcount_map_executes_once_per_file(spark, probe_files):
    """A4 jobcount semantics (mrapps/jobcount.go:34-46): count actual map
    executions. In a healthy run each input file is mapped exactly once —
    the accumulator equals the file count (a retry/speculative re-run
    would inflate it, which is precisely what jobcount detects)."""
    acc = spark.sparkContext.accumulator(0)

    def counting_map(filename, contents):
        acc.add(1)
        return [("files", "1")]

    def count_reduce(key, values):
        return str(len(values))

    out = {
        r["key"]: r["value"]
        for r in run_job_df(
            spark, counting_map, count_reduce, probe_files, n_reduce=2
        ).collect()
    }
    assert out == {"files": str(len(probe_files))}
    assert acc.value == len(probe_files)


def _max_overlap(intervals):
    """Max number of simultaneously-open (start, end) intervals."""
    events = [(t, +1) for t, _ in intervals] + [(t, -1) for _, t in intervals]
    depth = best = 0
    for _, step in sorted(events):
        depth += step
        best = max(best, depth)
    return best


def test_mtiming_map_tasks_overlap(spark, probe_files):
    """A7 mtiming (mrapps/mtiming.go:19-62): map tasks must run in
    parallel. Each map task sleeps and emits its wall-clock interval;
    with 8 whole-file tasks on a multi-core master, intervals overlap.
    The status tracker must also observe >1 concurrently active task."""
    def first_reduce(key, values):
        return values[0]

    # The tracker poll races task scheduling (a fast run can finish
    # between 50 ms samples), so the probe retries with longer task
    # sleeps; the interval-overlap assertion is the hard signal either
    # way and is checked on every attempt.
    peak = 0
    for task_sleep in (0.4, 1.0, 2.0):

        def timing_map(filename, contents, _s=task_sleep):
            t0 = time.time()
            time.sleep(_s)
            return [(filename, f"{t0}:{time.time()}")]

        peak_active = []
        done = threading.Event()

        def poll():
            tracker = spark.sparkContext.statusTracker()
            best = 0
            deadline = time.time() + 60
            while not done.is_set() and time.time() < deadline:
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info:
                        best = max(best, info.numActiveTasks)
                time.sleep(0.02)
            peak_active.append(best)

        poller = threading.Thread(target=poll)
        poller.start()
        try:
            rows = run_job_df(
                spark, timing_map, first_reduce, probe_files, n_reduce=2
            ).collect()
        finally:
            done.set()
            poller.join()
        intervals = [tuple(map(float, r["value"].split(":"))) for r in rows]
        assert len(intervals) == len(probe_files)
        assert _max_overlap(intervals) > 1, "map tasks ran sequentially"
        peak = max(peak, peak_active[0] if peak_active else 0)
        if peak > 1:
            break
    assert peak > 1, "status tracker saw no parallelism"


def test_rtiming_reduce_tasks_overlap(spark, probe_files):
    """A8 rtiming (mrapps/rtiming.go:78-84): reduce tasks must run in
    parallel. One key per input file hash-spreads over 8 reduce
    partitions; each reducef call sleeps and reports its interval —
    intervals from different reduce tasks must overlap."""

    def key_map(filename, contents):
        return [(filename, "x")]

    def timing_reduce(key, values):
        t0 = time.time()
        time.sleep(0.4)
        return f"{t0}:{time.time()}"

    rows = run_job_df(
        spark, key_map, timing_reduce, probe_files, n_reduce=8
    ).collect()
    intervals = [tuple(map(float, r["value"].split(":"))) for r in rows]
    assert len(intervals) == len(probe_files)
    assert _max_overlap(intervals) > 1, "reduce tasks ran sequentially"


def test_observe_metrics_jobcount_native(spark, sf_dir):
    """A4 jobcount, native tier: `df.observe` attaches aggregate metrics
    to a query's OWN execution (no second job, unlike accumulators which
    need a separate probe pass) — the Observation API reports rows seen
    and value mass for exactly the rows the action consumed."""
    from pyspark.sql import Observation, functions as F

    from go_map_reduce_spark.catalog import load_table

    obs = Observation("probe")
    df = (
        load_table(spark, sf_dir, "orders")
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum((F.col("o_totalprice") > 0).cast("long")).alias("positive"),
        )
        .groupBy("o_orderpriority")
        .count()
    )
    per_prio = {r["o_orderpriority"]: r["count"] for r in df.collect()}
    n = sum(per_prio.values())
    assert obs.get["rows_seen"] == n
    assert obs.get["positive"] == n  # all totalprices positive
