from go_map_reduce_spark.parity.mapreduce import run_job, run_job_df  # noqa: F401
