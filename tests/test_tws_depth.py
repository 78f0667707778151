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
        _ensure_vendored_protobuf,
    )
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
        read_events_stream,
    )

    ensure_package_shipped(spark)
    _ensure_vendored_protobuf()
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


class _TimerProbe:
    """ValueState running count + an already-expired processing-time
    timer registered per key: the availableNow run's timer sweep fires
    handleExpiredTimer for every key, emitting the count its state
    held — executed timer coverage for the typed-state API
    (MapState/ListState/ValueState are covered above and by the
    registered query).

    Two hard-won environment facts this test encodes: (1) the worker
    invokes handleExpiredTimer with KEYWORD arguments, so the
    parameter must be spelled `expiredTimerInfo`; (2) with the default
    trigger, timeMode="ProcessingTime" never quiesces for
    processAllAvailable (the engine keeps scheduling timer-sweep
    batches), so the query must run under trigger(availableNow=True)
    and the test polls the sink instead of awaiting termination."""

    def init(self, handle) -> None:
        self._h = handle
        self._cnt = handle.getValueState("cnt", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        n = sum(len(pdf) for pdf in rows)
        prev = self._cnt.get()[0] if self._cnt.exists() else 0
        self._cnt.update((prev + n,))
        self._h.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() - 1
        )
        yield pd.DataFrame(
            [(key[0], "data", prev + n)], columns=["user_id", "kind", "n"]
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        n = self._cnt.get()[0] if self._cnt.exists() else 0
        yield pd.DataFrame(
            [(key[0], "timer", n)], columns=["user_id", "kind", "n"]
        )

    def close(self) -> None:
        pass


class _EventTimeTimerProbe:
    """ValueState running count + an event-time timer registered at
    (batch max event-time + 1s): the timer expires only once the
    WATERMARK passes it — the late-data mechanism a production
    pipeline runs — and the expiry emit carries both the count the
    state held and the expiry timestamp, so the test can pin that
    expiry was watermark-driven (fires in a LATER batch, at exactly
    the registered ms). Timers are per-key singletons: re-arming
    deletes the previous registration first (listTimers yields bare
    expiry-ms ints; a key that appears in TWO batches — user 2 below —
    runs this loop over a non-empty iterator, so ListTimers/DeleteTimer
    get real executed coverage, pinned by user 2 firing exactly once at
    the RE-ARMED timestamp)."""

    def init(self, handle) -> None:
        self._h = handle
        self._cnt = handle.getValueState("cnt", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        mx = 0
        n = 0
        for pdf in rows:
            n += len(pdf)
            mx = max(mx, int(pdf["ts"].astype("int64").max() // 1_000_000))
        prev = self._cnt.get()[0] if self._cnt.exists() else 0
        self._cnt.update((prev + n,))
        for t in self._h.listTimers():
            self._h.deleteTimer(t)
        self._h.registerTimer(mx + 1000)
        yield pd.DataFrame(
            [(key[0], "data", prev + n, mx + 1000)],
            columns=["user_id", "kind", "n", "expiry_ms"],
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        n = self._cnt.get()[0] if self._cnt.exists() else 0
        yield pd.DataFrame(
            [(key[0], "timer", n, expiredTimerInfo.getExpiryTimeInMs())],
            columns=["user_id", "kind", "n", "expiry_ms"],
        )

    def close(self) -> None:
        pass


def test_event_time_timers_fire_on_watermark(spark, tmp_path):
    """timeMode="EventTime": four files fed one-per-batch with
    strictly increasing event times. User 1 appears only in file a, so
    its timer (T0+1s) becomes expirable exactly when a later file
    advances the watermark past T0+1s. User 2 appears in files a AND b:
    batch b finds its live T0+1s timer via listTimers (non-empty — the
    executed ListTimers/DeleteTimer coverage), deletes it, and re-arms
    at T0+1h+1s; it must fire exactly ONCE, at the re-armed ms (a
    leaked undeleted timer would produce a second fire at T0+1s).
    Differential: each timer emit carries the batch-oracle total count
    for its user and the exact registered expiry ms — watermark-driven
    expiry, not wall-clock."""
    import datetime
    import os
    import time

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.stateful import (
        _ensure_protobuf_visible_to_workers,
        _ensure_vendored_protobuf,
    )
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
    )

    ensure_package_shipped(spark)
    _ensure_vendored_protobuf()
    _ensure_protobuf_visible_to_workers(spark)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if tests_dir not in cur.split(":"):
        env["PYTHONPATH"] = tests_dir + ((":" + cur) if cur else "")

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t0_ms = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    src = tmp_path / "et_src"
    src.mkdir()
    schema = "user_id bigint, ts timestamp"
    batches = [
        ("a", [(1, t0), (1, t0), (2, t0)]),
        ("b", [(2, t0 + datetime.timedelta(hours=1)),
               (10, t0 + datetime.timedelta(hours=1))]),
        ("c", [(11, t0 + datetime.timedelta(hours=2))]),
        ("d", [(12, t0 + datetime.timedelta(hours=3))]),
    ]
    for i, (fname, rows) in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / fname)
        )
        # file-source ordering is by modification time; make it strict
        for root, _dirs, files in os.walk(src / fname):
            for f in files:
                os.utime(os.path.join(root, f), (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        _EventTimeTimerProbe(),
        outputStructType=(
            "user_id bigint, kind string, n bigint, expiry_ms bigint"
        ),
        outputMode="Update",
        timeMode="EventTime",
    )
    name = f"twse_{uuid.uuid4().hex[:12]}"
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        with _stream_state_partitions(spark, 2):
            q = (
                out.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            try:
                deadline = time.time() + 120
                while time.time() < deadline:
                    fired = (
                        spark.table(name)
                        .where("kind = 'timer' AND user_id IN (1, 2)")
                        .select("user_id")
                        .distinct()
                        .count()
                    )
                    if fired >= 2 or not q.isActive:
                        break
                    time.sleep(1)
            finally:
                q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    rows = spark.table(name).toPandas()
    fired = rows[(rows.kind == "timer") & rows.user_id.isin([1, 2])]
    # exactly one fire per user: user 2's original T0+1s timer was
    # deleted before re-arming, so no duplicate expiry exists
    assert len(fired) == 2, fired
    by_user = {
        int(r.user_id): (int(r.n), int(r.expiry_ms))
        for r in fired.itertuples()
    }
    # batch differential: the expired-timer emits carry each user's
    # exact total row count (all of a user's rows were processed
    # before its timer fired, so state-at-expiry = corpus count)…
    oracle = duckdb.sql(
        f"SELECT user_id, COUNT(*) AS n FROM '{src}/*/*.parquet' "
        "WHERE user_id IN (1, 2) GROUP BY user_id"
    ).df()
    expect = {int(r.user_id): int(r.n) for r in oracle.itertuples()}
    assert set(by_user) == set(expect) == {1, 2}, by_user
    assert {u: v[0] for u, v in by_user.items()} == expect
    # …and expired at exactly the registered event-time ms — the
    # watermark crossing fired them, not processing time: user 1 at
    # its one registration (T0+1s), user 2 at the RE-ARMED T0+1h+1s
    # (delete + re-register executed in batch b)
    assert by_user[1][1] == t0_ms + 1000, by_user
    assert by_user[2][1] == t0_ms + 3_601_000, by_user
    # every user produced data rows
    assert {int(u) for u in rows[rows.kind == "data"].user_id} == {
        1, 2, 10, 11, 12,
    }


def test_processing_time_timers_fire(spark, tmp_path):
    import os
    import time

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.stateful import (
        _ensure_protobuf_visible_to_workers,
        _ensure_vendored_protobuf,
    )
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
    )

    ensure_package_shipped(spark)
    _ensure_vendored_protobuf()
    _ensure_protobuf_visible_to_workers(spark)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if tests_dir not in cur.split(":"):
        env["PYTHONPATH"] = tests_dir + ((":" + cur) if cur else "")

    src = tmp_path / "timer_src"
    src.mkdir()
    schema = "user_id bigint, v bigint"
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], schema
    ).coalesce(1).write.parquet(str(src / "a.parquet"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = stream.groupBy("user_id").transformWithStateInPandas(
        _TimerProbe(),
        outputStructType="user_id bigint, kind string, n bigint",
        outputMode="Update",
        timeMode="ProcessingTime",
    )
    name = f"twst_{uuid.uuid4().hex[:12]}"
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        with _stream_state_partitions(spark, 2):
            q = (
                out.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            try:
                deadline = time.time() + 120
                while time.time() < deadline:
                    fired = (
                        spark.table(name)
                        .where("kind = 'timer'")
                        .select("user_id")
                        .distinct()
                        .count()
                    )
                    if fired >= 2 or not q.isActive:
                        break
                    time.sleep(1)
            finally:
                q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    rows = spark.table(name).toPandas()
    fired = rows[rows.kind == "timer"]
    by_user = {int(r.user_id): int(r.n) for r in fired.itertuples()}
    # every key's (already expired) timer fired, carrying the running
    # count its ValueState held at sweep time
    assert set(by_user) == {1, 2}, by_user
    assert by_user[1] == 2 and by_user[2] == 1
    data = rows[rows.kind == "data"]
    assert {int(r.user_id) for r in data.itertuples()} == {1, 2}


TTL_MS = 2000


class _TtlContrastProbe:
    """Two ValueStates updated identically — one with a {TTL_MS} ms
    TTL, one without — so a checkpoint-restart after sleeping past the
    TTL discriminates exactly the TTL mechanism: the expiring state
    must read as absent while its twin still carries the old total."""

    def init(self, handle) -> None:
        self._ttl = handle.getValueState("with_ttl", "n bigint", TTL_MS)
        self._keep = handle.getValueState("no_ttl", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = sum(len(pdf) for pdf in rows)
        ttl_exists = self._ttl.exists()
        keep_exists = self._keep.exists()
        ttl_prev = self._ttl.get()[0] if ttl_exists else 0
        keep_prev = self._keep.get()[0] if keep_exists else 0
        self._ttl.update((ttl_prev + n,))
        self._keep.update((keep_prev + n,))
        yield pd.DataFrame(
            [
                (
                    key[0],
                    bool(ttl_exists),
                    bool(keep_exists),
                    ttl_prev + n,
                    keep_prev + n,
                )
            ],
            columns=[
                "user_id", "ttl_existed", "keep_existed",
                "ttl_total", "keep_total",
            ],
        )

    def close(self) -> None:
        pass


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_value_state_ttl_expires_across_restart(spark, tmp_path):
    """State TTL, the last cell of the typed-state matrix: two
    availableNow runs share one checkpoint; the second starts after
    sleeping past TTL_MS. The TTL'd ValueState must read as ABSENT in
    run 2 (total restarts at the new batch's count) while the
    untouched no-TTL twin state still carries run 1's total — the
    mechanism a production pipeline uses to bound state size on
    unbounded key spaces."""
    import os
    import time

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.stateful import (
        _ensure_protobuf_visible_to_workers,
        _ensure_vendored_protobuf,
    )
    from go_map_reduce_spark.streaming.windows import (
        _stream_state_partitions,
    )

    ensure_package_shipped(spark)
    _ensure_vendored_protobuf()
    _ensure_protobuf_visible_to_workers(spark)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if tests_dir not in cur.split(":"):
        env["PYTHONPATH"] = tests_dir + ((":" + cur) if cur else "")

    src = tmp_path / "ttl_src"
    src.mkdir()
    ckpt = str(tmp_path / "ttl_ckpt")
    schema = "user_id bigint, v bigint"

    # the memory sink cannot recover from a checkpoint; foreachBatch
    # CAN, and supports update mode — collect each run's emitted rows
    # into a driver-side bucket (local mode: the closure shares this
    # interpreter)
    emitted: dict[str, list] = {}

    def run_once(label: str) -> None:
        bucket = emitted.setdefault(label, [])

        def sink(df, _batch_id) -> None:
            bucket.extend(df.collect())

        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        out = stream.groupBy("user_id").transformWithStateInPandas(
            _TtlContrastProbe(),
            outputStructType=(
                "user_id bigint, ttl_existed boolean, keep_existed boolean,"
                " ttl_total bigint, keep_total bigint"
            ),
            outputMode="Update",
            timeMode="ProcessingTime",
        )
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        with _stream_state_partitions(spark, 2):
            spark.createDataFrame(
                [(1, 10), (1, 11)], schema
            ).coalesce(1).write.parquet(str(src / "a.parquet"))
            run_once("run1")
            time.sleep(TTL_MS / 1000 + 1.5)  # sleep past the TTL
            spark.createDataFrame(
                [(1, 12), (1, 13), (1, 14)], schema
            ).coalesce(1).write.parquet(str(src / "b.parquet"))
            run_once("run2")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    (r1,) = emitted["run1"]
    assert not r1.ttl_existed and not r1.keep_existed, r1
    assert r1.ttl_total == 2 and r1.keep_total == 2, r1
    assert len(emitted["run2"]) == 1, emitted["run2"]
    (r2,) = emitted["run2"]
    # the TTL'd state expired during the sleep; its twin did not
    assert not r2.ttl_existed, r2
    assert r2.keep_existed, r2
    assert r2.ttl_total == 3, r2  # restarted at the new batch
    assert r2.keep_total == 5, r2  # carried run 1's total
