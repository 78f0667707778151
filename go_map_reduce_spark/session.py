"""SparkSession construction tuned for this engine.

Local mode is the test bed (one JVM, N threads); the config choices are
still made for a real cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), shuffle partitions sized to the
parallelism at hand rather than the 200 default, UTC session timezone so
timestamp semantics match the DuckDB oracle, Arrow transfer for any
pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# SQL confs the engine needs even on a session it did not build (the
# verify driver constructs its own SparkSession). All of these are
# runtime-settable SQL confs, applied by ``ensure_session_confs``.
RUNTIME_CONFS = {
    # events.parquet carries INT64 TIMESTAMP(NANOS) which the Spark
    # vectorized reader rejects; read as long and rebuild a TIMESTAMP_NTZ
    # in the catalog layer (catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are TZ-naive; pin Spark to UTC so LTZ<->NTZ
    # conversions are the identity.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs this engine depends on."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session builder already set it
    return spark


def get_spark(
    app_name: str = "go-map-reduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # ~1 shuffle partition per core locally; a cluster deployment
        # overrides this (or relies on AQE coalescing from a higher base).
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_session_confs(spark)
