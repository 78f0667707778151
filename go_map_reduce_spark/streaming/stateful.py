"""Custom stateful streaming operator via applyInPandasWithState.

The reference's Reduce is a holistic per-key aggregation over a batch
(mr/worker.go:148); the streaming generalization is per-key state
mutated batch-by-batch. This module implements per-user running
aggregates (event count + value sum) as an arbitrary-stateful operator:
state is a fixed-size (count, cents) pair per user, updated per
micro-batch, emitted in update mode.

Determinism note: float accumulation order inside a micro-batch is
arrival order, which is not reproducible — so value is accumulated in
integer CENTS (the events table carries 2dp values; round(value*100) is
exact) and converted to double once at emit. That makes the streaming
result bit-identical to the batch/DuckDB formulation regardless of
batch order — the same order-independence discipline as
functions/numeric.dsum.

Scale: state is O(distinct users) × 16 bytes, hash-partitioned by key
across the cluster by the streaming state store; per-batch work is an
Arrow-batched pandas pass per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_map_reduce_spark.registry import query

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, cents bigint"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # integer cents: order-independent accumulation (see module doc)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
    )


@query(
    "events_stateful_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def events_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming: per-user running totals kept in
    explicit GroupState, executed by the streaming engine (readStream →
    applyInPandasWithState → memory sink, run to completion). The oracle
    is the batch formulation — valid because cents-integer accumulation
    makes the result independent of batch arrival order."""
    import uuid

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.windows import read_events_stream

    ensure_package_shipped(spark)
    events = read_events_stream(spark, sf_dir).select("user_id", "value")
    totals = events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:12]}"
    from go_map_reduce_spark.streaming.windows import _stream_state_partitions

    with _stream_state_partitions(spark, 8):
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # update-mode memory sink may hold one row per user per batch; the
    # last emit per user is the final state. The single-file source
    # yields one batch, but dedup defensively by max n_events.
    sink = spark.table(name)
    from pyspark.sql import functions as F

    return (
        sink.groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "sum_value")).alias("_s"),
        )
        .select("user_id", "_s.n_events", "_s.sum_value")
    )
