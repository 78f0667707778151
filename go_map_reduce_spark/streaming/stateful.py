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

import os as _os

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


# ---------------------------------------------------------------------------
# transformWithState — the typed-state successor API (Spark 4)
# ---------------------------------------------------------------------------
class _TypeValueCounter:
    """StatefulProcessor: per-user MAP state keyed by event_type holding
    (count, integer cents) — exercises the composite state primitives
    (MapState) the old GroupState API lacks. Emits nothing per batch;
    the final state is read out in close-less complete style by
    emitting updated rows each batch (update mode) and taking the last
    emit per (user, type) — same discipline as
    events_stateful_user_totals."""

    def init(self, handle) -> None:
        self._m = handle.getMapState("per_type", "event_type string", "n bigint, cents bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        agg: dict[str, list[int]] = {}
        for pdf in rows:
            cents = pdf["value"].mul(100).round().astype("int64")
            for et, grp in cents.groupby(pdf["event_type"]):
                cur = agg.setdefault(et, [0, 0])
                cur[0] += len(grp)
                cur[1] += int(grp.sum())
        out = []
        for et, (dn, dc) in agg.items():
            prev = self._m.getValue((et,)) if self._m.containsKey((et,)) else (0, 0)
            n, cents_total = prev[0] + dn, prev[1] + dc
            self._m.updateValue((et,), (n, cents_total))
            out.append((key[0], et, n, cents_total / 100.0))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "n_events", "sum_value"]
        )

    def close(self) -> None:
        pass


_VENDOR_DIR = _os.path.join(
    _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ),
    "vendor",
)


def _protobuf_available() -> bool:
    """Side-effect-free gate: transformWithState's Python runner speaks
    protobuf to the JVM; without the google.protobuf package the
    streaming runner crashes at init. True when a runtime is either
    already importable (site-packages) or present as the repo-vendored
    pure-Python copy (vendor/README.md — protobuf 6.32.0 from the
    machine's own SDK bundle, PyPI being unreachable). Deciding
    registration needs only this existence check; the sys.path
    mutation that makes the vendored copy importable is deferred to
    ``_ensure_vendored_protobuf`` at OPERATOR CALL time, so importing
    the package never alters the interpreter's path for consumers that
    don't touch streaming (the environment rule: gate missing deps
    behind an import-try)."""
    import os

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    return os.path.isdir(_os.path.join(_VENDOR_DIR, "google", "protobuf"))


def _ensure_vendored_protobuf() -> None:
    """The ONLY place that mutates sys.path for the vendored runtime:
    APPEND vendor/ (a real site-packages installation wins the import)
    and fail loudly if no runtime imports even then — a clearer error
    at operator start than the streaming runner's init crash."""
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return
    except ImportError:
        pass
    if _VENDOR_DIR not in sys.path:
        sys.path.append(_VENDOR_DIR)
    from google.protobuf import descriptor  # noqa: F401


def _ensure_protobuf_visible_to_workers(spark: SparkSession) -> None:
    """transformWithState runs python OUTSIDE this interpreter in two
    places: the driver-side state-server/PreInit runner
    (StreamingPythonRunner — spawned for state-schema validation and
    NOT covered by the pyFiles task protocol) and the executor-side
    task workers. Both are spawned by PythonWorkerFactory, which merges
    the PythonFunction's envVars["PYTHONPATH"] — sourced from
    ``sc.environment`` — into the child's environment. So when the
    driver resolved protobuf from the vendored copy, putting vendor/
    on ``sc.environment["PYTHONPATH"]`` (idempotent) is what makes
    ``import google.protobuf`` work in every spawned runner; a real
    site-packages installation needs nothing (workers share the
    interpreter environment). Verified empirically: addPyFile alone
    reaches task workers but NOT the PreInit runner, which then dies
    with ImportError at state-schema validation. vendor/ is APPENDED
    to any pre-existing PYTHONPATH — same precedence policy as the
    driver side (existing entries win within PYTHONPATH); PYTHONPATH
    as a whole still shadows a spawned worker's site-packages, an
    asymmetry the local[*] target never hits since workers share this
    interpreter's environment (and this branch only runs when the
    driver itself resolved protobuf from vendor/)."""
    import google.protobuf as _pb

    if not _os.path.abspath(_pb.__file__).startswith(
        _os.path.abspath(_VENDOR_DIR)
    ):
        return
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if _VENDOR_DIR not in cur.split(":"):
        env["PYTHONPATH"] = (cur + ":" if cur else "") + _VENDOR_DIR


_TWS_ORACLE = """
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY user_id, event_type
    """


def events_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (the Spark 4 typed-state API): per-user
    MapState keyed by event_type accumulating (count, cents). Composite
    state (maps/lists with per-entry access) is the API's advance over
    applyInPandasWithState's single value tuple — state entries are
    read/written individually, so a hot user's state isn't rewritten
    wholesale per batch. Executed by the streaming engine to
    completion; cents-integer accumulation keeps the result independent
    of batch order, so the batch SQL oracle matches exactly."""
    import uuid

    from pyspark.sql import functions as F

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
        read_events_stream,
    )

    ensure_package_shipped(spark)
    _ensure_vendored_protobuf()
    _ensure_protobuf_visible_to_workers(spark)
    events = read_events_stream(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    out = events.groupBy("user_id").transformWithStateInPandas(
        _TypeValueCounter(),
        outputStructType=(
            "user_id bigint, event_type string, n_events bigint, sum_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )
    name = f"tws_{uuid.uuid4().hex[:12]}"
    # transformWithState stores each state variable in its own column
    # family; the default HDFS-backed provider supports exactly one, so
    # the API REQUIRES RocksDB (the provider production uses anyway —
    # state not bounded by executor heap). Set it for this stream and
    # restore the session's previous provider after.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        with _stream_state_partitions(spark, 8):
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
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    sink = spark.table(name)
    return (
        sink.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("_s"))
        .select("user_id", "event_type", "_s.n_events", "_s.sum_value")
    )


if _protobuf_available():  # pragma: no cover - environment-dependent
    query("events_transform_with_state", oracle=_TWS_ORACLE)(
        events_transform_with_state
    )
