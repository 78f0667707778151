"""MapReduce-parity API: the reference framework's full user surface on Spark.

The reference's programming model (SURVEY.md §2a) is:

    Map(filename, contents) -> [](key, value)      # mr/worker.go:36
    Reduce(key, []values)   -> value               # mr/worker.go:37

run over whole text files with a hash-partitioned shuffle into
``n_reduce`` buckets (mr/worker.go:21-25,75), per-partition key sort +
run-length grouping (mr/worker.go:127-148), and a ``"key value"`` text
sink (mr/worker.go:151).

``run_job`` reproduces those semantics with Spark primitives:

- F1/F2 whole-file scan  → ``sc.wholeTextFiles`` (exactly one
  (filename, contents) pair per file — file splitting disabled, like the
  reference's one-file-one-task rule, mr/coordinator.go:74-78)
- F3 Map                 → ``flatMap``
- F4/F5 hash shuffle     → ``partitionBy(n_reduce)`` with Python's
  string hash in FNV's role (hash *identity* is explicitly out of scope,
  only grouping semantics matter — SURVEY.md §7 hard-part 4)
- F6/F7 sort+group       → per-partition sort-group (``groupByKey``)
- F8 Reduce              → one ``reducef(key, values)`` call per
  distinct key; values arrive in nondeterministic order exactly like the
  reference (SURVEY.md §1), so deterministic apps must sort inside
  Reduce (the discipline of mrapps/indexer.go:37)
- F9 text sink           → ``write_text_output`` ("key value" lines)

Everything else in §2a (scheduler, barrier, reaper, retry, atomic
rename, RPC — F12-F18) is Spark's DAG scheduler / shuffle / committer
and needs no code.

Scale caveat (documented, inherited from the reference): Reduce is a
holistic UDAF — all values of one key are materialized for one call,
exactly as the reference accumulates them in memory (mr/worker.go:98-124).
Hot keys therefore bound scalability; the native operator library
(operators/*) is the scale path, this API is the compatibility path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]


def run_job(
    spark: SparkSession,
    mapf: MapFn,
    reducef: ReduceFn,
    inputs: Sequence[str],
    n_reduce: int = 10,
):
    """Run a MapReduce job; returns an RDD of (key, reduced_value).

    Semantics-parity core: whole-file map tasks, hash shuffle on key into
    n_reduce partitions, grouped holistic reduce.
    """
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    # wholeTextFiles takes a comma-joined path list, so a path containing
    # a comma would be silently split into two bogus paths — reject it.
    for p in inputs:
        if "," in p:
            raise ValueError(f"input path may not contain ',': {p!r}")
    files = spark.sparkContext.wholeTextFiles(",".join(inputs), minPartitions=len(inputs))
    kvs = files.flatMap(lambda fc: mapf(fc[0], fc[1]))
    # One shuffle: hash-partition by key into n_reduce buckets, group
    # within the bucket, one reducef call per distinct key — the exact
    # dataflow of mr/worker.go:72-148 with Spark's shuffle as transport.
    grouped = kvs.groupByKey(numPartitions=n_reduce)
    return grouped.map(lambda kv: (kv[0], reducef(kv[0], list(kv[1]))))


def run_job_df(
    spark: SparkSession,
    mapf: MapFn,
    reducef: ReduceFn,
    inputs: Sequence[str],
    n_reduce: int = 10,
) -> DataFrame:
    """run_job returning a DataFrame(key string, value string)."""
    rdd = run_job(spark, mapf, reducef, inputs, n_reduce)
    return spark.createDataFrame(rdd, schema="key string, value string")


def write_text_output(df: DataFrame, path: str) -> None:
    """F9 text sink: one '"key value"' line per reduced key (the
    reference's output format, mr/worker.go:151, mrsequential.go:80-81).
    Spark's FileOutputCommitter supplies the tmpfile+rename atomicity the
    reference hand-rolls (mr/worker.go:156-164)."""
    from pyspark.sql import functions as F

    df.select(F.concat_ws(" ", "key", "value")).write.mode("overwrite").text(path)


def sequential_oracle(
    mapf: MapFn,
    reducef: ReduceFn,
    named_inputs: Sequence[tuple[str, str]],
) -> dict[str, str]:
    """Plain-Python reimplementation of the reference's sequential runner
    (main/mrsequential.go:38-78): map all files → global key sort →
    run-length group → reduce. This is the test oracle, playing the role
    mrsequential plays for main/test-mr.sh:68."""
    intermediate: list[tuple[str, str]] = []
    for name, contents in named_inputs:
        intermediate.extend(mapf(name, contents))
    intermediate.sort(key=lambda kv: kv[0])
    out: dict[str, str] = {}
    i = 0
    while i < len(intermediate):
        j = i
        values = []
        while j < len(intermediate) and intermediate[j][0] == intermediate[i][0]:
            values.append(intermediate[j][1])
            j += 1
        out[intermediate[i][0]] = reducef(intermediate[i][0], values)
        i = j
    return out
