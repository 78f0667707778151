"""Command-line entry point — the analog of the reference's binaries.

The reference ships `mrsequential wc.so pg*.txt` / `mrcoordinator` +
`mrworker` (main/, SURVEY.md §3). On Spark there is no
coordinator/worker pair to manage, so ONE command covers the surface:

    python -m go_map_reduce_spark.cli <app> <input_glob> <output_dir>
        [--n-reduce N] [--cpus N]

Apps are the reference's plugin apps (SURVEY.md §2b): wc, indexer,
file_count, crash_data. Output is the reference's format: 'key value'
lines (mr/worker.go:151), written as mr-out-style part files.
"""

from __future__ import annotations

import argparse
import sys

APPS = {
    "wc": ("wc_map", "wc_reduce"),
    "indexer": ("indexer_map", "indexer_reduce"),
    "file_count": ("file_count_map", "file_count_reduce"),
    "crash_data": ("crash_map", "sorted_join_reduce"),
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="go_map_reduce_spark",
        description="Run a MapReduce-parity app over text files on Spark.",
    )
    ap.add_argument("app", choices=sorted(APPS))
    ap.add_argument("input_glob", help="file, directory, or glob of text inputs")
    ap.add_argument("output_dir", help="output directory ('key value' text files)")
    ap.add_argument("--n-reduce", type=int, default=10, help="reduce partitions")
    ap.add_argument("--cpus", type=int, default=None, help="local[] parallelism")
    args = ap.parse_args(argv)

    from go_map_reduce_spark import parity
    from go_map_reduce_spark.parity import apps
    from go_map_reduce_spark.parity.mapreduce import write_text_output
    from go_map_reduce_spark.session import get_spark

    mapf = getattr(apps, APPS[args.app][0])
    reducef = getattr(apps, APPS[args.app][1])
    spark = get_spark(
        app_name=f"gmrs-cli-{args.app}",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    try:
        df = parity.run_job_df(
            spark, mapf, reducef, [args.input_glob], n_reduce=args.n_reduce
        )
        write_text_output(df, args.output_dir)
        n = df.count()
        print(f"{args.app}: {n} keys -> {args.output_dir}", file=sys.stderr)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
