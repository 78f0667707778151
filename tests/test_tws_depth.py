"""Depth coverage for transformWithStateInPandas beyond the registered
MapState query (events_transform_with_state): ListState and ValueState
primitives, executed end-to-end through the vendored protobuf runtime
and compared against a batch DuckDB oracle.

Order-independence discipline: every emitted aggregate (count, min,
max, sum of integer event ids) is invariant to micro-batch arrival
order, so the streaming result is bit-comparable to the batch oracle
no matter how the file source batches rows."""

import uuid

import duckdb
import pandas as pd
import pytest

from go_map_reduce_spark.streaming.stateful import _protobuf_available

pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="no protobuf runtime (site-packages or vendored) — "
    "transformWithState's wire layer cannot start",
)

SF = "/root/testdata/sf0.001"


class _ListAndValueTracker:
    """Per-user ListState of raw event ids plus a ValueState running
    count; emits order-independent reductions of the full list each
    batch (update mode — last emit per user wins)."""

    def init(self, handle) -> None:
        self._ids = handle.getListState("ids", "event_id bigint")
        self._n = handle.getValueState("n", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        for pdf in rows:
            self._ids.appendList(
                [(int(v),) for v in pdf["event_id"]]
            )
            prev = self._n.get()[0] if self._n.exists() else 0
            self._n.update((prev + len(pdf),))
        ids = [r[0] for r in self._ids.get()]
        yield pd.DataFrame(
            [
                (
                    key[0],
                    self._n.get()[0],
                    len(ids),
                    min(ids),
                    max(ids),
                    sum(ids),
                )
            ],
            columns=[
                "user_id", "n_value", "n_list", "min_id", "max_id", "sum_id"
            ],
        )

    def close(self) -> None:
        pass


def test_list_and_value_state_match_batch_oracle(spark):
    from pyspark.sql import functions as F

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.stateful import (
        _ensure_protobuf_visible_to_workers,
    )
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
        read_events_stream,
    )

    ensure_package_shipped(spark)
    _ensure_protobuf_visible_to_workers(spark)
    # the processor class lives in THIS test module; the streaming
    # runner unpickles it by reference, so the tests dir must be on the
    # spawned runner's path — same sc.environment[PYTHONPATH] route the
    # vendored protobuf uses (pyFiles doesn't reach that runner)
    import os

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if tests_dir not in cur.split(":"):
        env["PYTHONPATH"] = tests_dir + ((":" + cur) if cur else "")
    events = read_events_stream(spark, SF).select("user_id", "event_id")
    out = events.groupBy("user_id").transformWithStateInPandas(
        _ListAndValueTracker(),
        outputStructType=(
            "user_id bigint, n_value bigint, n_list bigint, "
            "min_id bigint, max_id bigint, sum_id bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )
    name = f"twsd_{uuid.uuid4().hex[:12]}"
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        with _stream_state_partitions(spark, 4):
            q = (
                out.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    sink = spark.table(name)
    # update mode re-emits a user on every batch that touches it; the
    # LAST emit (max n_list) carries the complete state
    last = (
        sink.groupBy("user_id")
        .agg(
            F.max(
                F.struct("n_list", "n_value", "min_id", "max_id", "sum_id")
            ).alias("s")
        )
        .select("user_id", "s.*")
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )

    oracle = (
        duckdb.sql(
            f"""
        SELECT user_id,
               COUNT(*) AS n_value, COUNT(*) AS n_list,
               MIN(event_id) AS min_id, MAX(event_id) AS max_id,
               SUM(event_id) AS sum_id
        FROM '{SF}/events.parquet'
        GROUP BY user_id ORDER BY user_id
        """
        )
        .df()
        .sort_values("user_id", ignore_index=True)
    )
    assert len(last) == len(oracle) > 0
    for col in ["n_value", "n_list", "min_id", "max_id", "sum_id"]:
        assert last[col].astype("int64").tolist() == oracle[
            col
        ].astype("int64").tolist(), col
    # the two state primitives agree with each other too
    assert (last.n_value == last.n_list).all()
