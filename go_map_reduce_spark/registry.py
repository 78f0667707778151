"""Query registry: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

This is the engine's public query surface, mirrored 1:1 by
``__spark_entry__.queries()`` / ``oracle_sql()``. The oracle SQL is the
differential-test twin (the role mrsequential plays for the reference's
test harness, main/test-mr.sh:68-98): same computation, independent
engine, compared order-insensitively.

Determinism contract (carried from the reference — any collected list is
sorted before serialization, mrapps/indexer.go:37, mrapps/crash.go:51):
every registered query must be order-insensitively deterministic, and
floating-point aggregates must be computed in a summation-order-free way
(see ``functions.numeric.dsum``) so the Spark result is bit-identical to
the oracle's.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# Caller-owned persist lifecycle.
#
# Query functions return LAZY DataFrames, so a persist that the returned
# plan depends on cannot be released inside the function (nothing has
# materialized yet).  Functions register such frames with track_cache();
# whoever materializes the result (bench.py, the pytest harness, the CLI)
# calls release_caches() afterwards.  An operator that materialized
# internally could unpersist inline instead — none currently does (the
# last such case, minhash_recall_eval, was rewritten in r08 into a
# single lazy full-outer-join plan with no persists at all).
# ---------------------------------------------------------------------------

_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted frame for caller-owned release; returns it."""
    _LIVE_CACHES.append(df)
    return df


# ---------------------------------------------------------------------------
# Cross-query shared frames.
#
# Some frames are composed by SEVERAL registered queries (the near-dup
# cluster assignment feeds the histogram, the keep-best selector, the
# leakage-safe split and the curation capstone).  At 100 TB a pipeline
# materializes such a frame ONCE; re-deriving it per query is pure waste.
# track_cache() can't express that sharing: the bench releases tracked
# persists (and sweeps the SQL CacheManager via clearCache()) after every
# query, exactly so query i's cache can't pressure query i+1's heap.
#
# shared_frame() therefore memoizes per (SparkContext, key, data
# fingerprint) a frame whose lineage ends in eager localCheckpoint
# blocks: checkpoint RDD blocks are NOT CacheManager entries, so the
# per-query clearCache()/release_caches() sweep leaves them alone, and
# re-executing the memoized plan re-reads the (small,
# cluster-assignment-sized) blocks instead of re-running the upstream
# pipeline.  Keying by applicationId makes a stopped/restarted context
# miss (its blocks died with it) and evicts entries from dead contexts
# so the memo can't resurrect frames across sessions; folding the data
# path's listing fingerprint (names, sizes, mtimes) into the key makes
# a rewrite of the data UNDER the same path within one application miss
# instead of silently serving the pre-rewrite frame.  Every builder is
# deterministic (registry contract), so reuse is semantically invisible
# — a standalone run just builds on first call.
#
# Non-local-master caveat: localCheckpoint blocks live on executors and
# are NOT recoverable if an executor holding them dies — on a real
# cluster a shared frame should be written to (and re-read from) a
# durable location instead, or rebuilt via invalidate_shared().  In
# this repo's single-JVM local[...] deployment executor loss is process
# death, so block loss cannot outlive the memo entry.
# ---------------------------------------------------------------------------

_SHARED_FRAMES: dict[tuple[str, str, str], DataFrame] = {}

# Durable-location mode (r14 verdict item 6): localCheckpoint blocks
# live on executors and die with them — fine in local[...] (executor
# loss = process death), a correctness gap on a real cluster.  With
# SPARK_GRAFT_SHARED_DURABLE_DIR set, each built shared frame is
# additionally written as parquet under
# <dir>/<applicationId>/<md5(key:fingerprint)>/ and the memo holds a
# READ of that parquet: the frame survives any executor loss, and a
# vanished/damaged location is detected on the next shared_frame call
# and rebuilt from source (rebuild-on-loss, covered by
# tests/test_round15_opt.py).  The location is namespaced by
# applicationId and removed at interpreter exit, so NOTHING persists
# across processes — this is a spill location, not a cross-run cache.
_DURABLE_ENV = "SPARK_GRAFT_SHARED_DURABLE_DIR"
_SHARED_DURABLE_LOC: dict[tuple[str, str, str], str] = {}
_DURABLE_APP_DIRS: set[str] = set()


def _cleanup_durable_dirs() -> None:
    import shutil

    while _DURABLE_APP_DIRS:
        shutil.rmtree(_DURABLE_APP_DIRS.pop(), ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_durable_dirs)


def _data_fingerprint(path: Optional[str]) -> str:
    """Recursive listing fingerprint (relative paths + sizes + mtimes)
    of a data directory — stat-only, no content read.

    The walk covers NESTED files too, so a rewrite inside a
    directory-style/partitioned parquet table (new part file, rewritten
    part file, added hive partition dir) changes the fingerprint just
    like a top-level rewrite does.  On the flat single-file-table
    layouts this repo's sf_dirs use (TESTDATA.md) the walk degenerates
    to one readdir + stats — same cost class as the previous
    non-recursive scan.  Directory traversal order is pinned
    (lexicographic via in-place dirnames sort) so the digest is
    deterministic across platforms.  Coverage:
    tests/test_registry_shared.py::test_fingerprint_sees_nested_rewrites
    pins that a nested-file rewrite MUST change the fingerprint and
    MUST miss the shared_frame memo."""
    if path is None:
        return ""
    import hashlib
    import os

    try:
        os.listdir(path)
    except OSError:
        # a MISSING/unreadable root is a stable state ("no data") and
        # may alias itself across calls
        return "unreadable"
    # A PARTIAL walk must never alias a stable fingerprint: os.walk's
    # default swallows unreadable subdirectories, so a transient
    # permission/NFS failure inside a partitioned table would yield a
    # valid-looking digest over the readable subset (r11 review
    # finding).  Any mid-walk error therefore returns a never-matching
    # token — the memo misses and the frame rebuilds until the listing
    # is whole again (correctness-first invalidation, the mr/s3.go
    # truncate discipline).  One exception (r11 ADVICE): a file that
    # VANISHES between listing and stat (a concurrent writer removing
    # a _temporary/.crc file) is a stable state, not a degraded one —
    # the post-deletion digest simply never includes it, so skipping
    # converges to exactly that digest instead of evicting the entry
    # on every call until the directory goes quiet.  Permission/IO
    # errors and os.walk onerror failures keep the degraded token.
    errors: list[OSError] = []
    h = hashlib.md5()
    for dirpath, dirnames, filenames in os.walk(path, onerror=errors.append):
        dirnames.sort()
        rel = os.path.relpath(dirpath, path)
        for n in sorted(filenames):
            try:
                st = os.stat(os.path.join(dirpath, n))
            except FileNotFoundError as ex:
                # Disambiguate "entry truly gone" (concurrent delete —
                # a stable state the digest converges past) from "a
                # DANGLING SYMLINK still occupies the name" (r12
                # ADVICE): os.stat follows links, so a data file
                # replaced by a broken symlink raises
                # FileNotFoundError on every call and would otherwise
                # become permanently invisible to the digest — the
                # memo would keep serving the pre-replacement frame.
                # lstat does not follow: it succeeding means the link
                # itself persists → degraded token (memo miss until
                # the link is fixed or removed); it failing too means
                # the name really vanished → skip as before.
                try:
                    os.lstat(os.path.join(dirpath, n))
                except OSError:
                    continue  # concurrent delete — stable digest skips it
                errors.append(ex)
                continue
            except OSError as ex:
                errors.append(ex)
                continue
            relp = n if rel == "." else os.path.join(rel, n)
            h.update(f"{relp}:{st.st_size}:{st.st_mtime_ns};".encode())
    if errors:
        _DEGRADED_COUNT[0] += 1
        return f"degraded-{_DEGRADED_COUNT[0]}"
    return h.hexdigest()


_DEGRADED_COUNT = [0]


def shared_frame(
    spark: SparkSession,
    key: str,
    builder: Callable[[], DataFrame],
    data_path: Optional[str] = None,
) -> DataFrame:
    """Build-once frame shared across queries of one SparkContext.

    ``builder`` must return a frame whose lineage is truncated by eager
    ``localCheckpoint`` (so reuse is a block read, not a recompute, and
    survives the bench's per-query cache sweeps).  Pass the source data
    directory as ``data_path`` so its listing fingerprint joins the
    memo key: rewriting the data under the same path invalidates the
    entry instead of serving the stale frame.
    """
    import os

    k = (spark.sparkContext.applicationId, key, _data_fingerprint(data_path))
    loc = _SHARED_DURABLE_LOC.get(k)
    if k in _SHARED_FRAMES and loc is not None and not os.path.isdir(loc):
        # durable location lost (disk eviction, manual cleanup):
        # rebuild from source instead of serving a frame whose scan
        # will fail at action time
        del _SHARED_FRAMES[k]
        del _SHARED_DURABLE_LOC[k]
    if k not in _SHARED_FRAMES:
        for dead in [
            x
            for x in _SHARED_FRAMES
            if x[0] != k[0] or (x[1] == k[1] and x[2] != k[2])
        ]:
            del _SHARED_FRAMES[dead]
            _SHARED_DURABLE_LOC.pop(dead, None)
        df = builder()
        root = os.environ.get(_DURABLE_ENV)
        if root:
            import hashlib

            app_dir = os.path.join(root, k[0])
            loc = os.path.join(
                app_dir, hashlib.md5(f"{k[1]}:{k[2]}".encode()).hexdigest()
            )
            df.write.mode("overwrite").parquet(loc)
            _DURABLE_APP_DIRS.add(app_dir)
            df = spark.read.parquet(loc)
            _SHARED_DURABLE_LOC[k] = loc
        _SHARED_FRAMES[k] = df
    return _SHARED_FRAMES[k]


def memo_snapshot(spark: SparkSession) -> tuple:
    """Snapshot every session-level memo a query can populate: the
    shared_frame entries, the streaming-admit finished-state dirs, and
    the catalog's tables/temp views (the bucketed layout and the
    streaming memory sinks).  Paired with memo_restore() this is the
    bench's memo-aware repetition hook (r14 verdict item 1): between
    best-of reps the state a rep built is evicted, so every rep pays
    the same build cost and best-of can never bill a block read as the
    named computation."""
    from go_map_reduce_spark.streaming import admit

    tables = {(t.name, bool(t.isTemporary)) for t in spark.catalog.listTables()}
    return (set(_SHARED_FRAMES), set(admit._ADMIT_STATE_DIRS), tables)


def memo_grew(spark: SparkSession, snap: tuple) -> bool:
    """True when session-level memo state exists now that did not at
    snapshot time — i.e. the intervening work BUILT shared state whose
    steady-state (memo-read) cost differs from its build cost."""
    from go_map_reduce_spark.streaming import admit

    frames, dirs, tables = snap
    if any(k not in frames for k in _SHARED_FRAMES):
        return True
    if any(k not in dirs for k in admit._ADMIT_STATE_DIRS):
        return True
    now = {(t.name, bool(t.isTemporary)) for t in spark.catalog.listTables()}
    return any(t not in tables for t in now)


def memo_restore(spark: SparkSession, snap: tuple) -> dict:
    """Evict session-level memo state created after ``snap``:
    shared_frame entries, admit state dirs (rmtree'd), and catalog
    tables/temp views (managed tables dropped with their warehouse
    data; temp views — e.g. streaming memory sinks — dropped, freeing
    the sink rows).  Entries that existed at snapshot time are LEFT
    ALONE, so restoring between reps of query N never touches state an
    earlier query built (first-consumer billing stays once-per-suite).
    Returns eviction counts per category."""
    import shutil

    from go_map_reduce_spark.streaming import admit

    frames, dirs, tables = snap
    n_frames = 0
    for k in [k for k in _SHARED_FRAMES if k not in frames]:
        del _SHARED_FRAMES[k]
        loc = _SHARED_DURABLE_LOC.pop(k, None)
        if loc is not None:
            shutil.rmtree(loc, ignore_errors=True)
        n_frames += 1
    n_dirs = 0
    for k in [k for k in admit._ADMIT_STATE_DIRS if k not in dirs]:
        shutil.rmtree(admit._ADMIT_STATE_DIRS.pop(k), ignore_errors=True)
        n_dirs += 1
    n_tables = 0
    for t in spark.catalog.listTables():
        key = (t.name, bool(t.isTemporary))
        if key in tables:
            continue
        if t.isTemporary:
            spark.catalog.dropTempView(t.name)
        else:
            spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")
        n_tables += 1
    return {"frames": n_frames, "state_dirs": n_dirs, "tables": n_tables}


def invalidate_shared(key_prefix: str = "") -> int:
    """Drop memoized shared frames whose key starts with ``key_prefix``
    (all of them by default); returns how many were evicted.  The hook
    for callers that know the underlying data or cluster state changed
    in a way the listing fingerprint cannot see (e.g. executor loss on
    a non-local master)."""
    doomed = [x for x in _SHARED_FRAMES if x[1].startswith(key_prefix)]
    for x in doomed:
        del _SHARED_FRAMES[x]
        _SHARED_DURABLE_LOC.pop(x, None)
    return len(doomed)


def release_caches() -> int:
    """Unpersist every tracked frame (newest first); returns how many."""
    n = len(_LIVE_CACHES)
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL).

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible operators.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
