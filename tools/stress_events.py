"""Events-side scaling sweep for the r13-extension operator family
(sessionized dialog corpus, k-anonymity release, sessionization).

tools/stress_scale.py multiplies the DOCUMENTS corpus; the extension
batch added operators whose scale axis is the EVENTS log, so this
sibling sweep multiplies events instead: mult replicas of sf0.1's
events with disjoint user_id / event_id ranges and UNTOUCHED
timestamps — users scale linearly, per-user activity (and therefore
session structure, QI bands, transcript sizes) is preserved
byte-for-byte, so outputs must scale exactly linearly and wall-clock
should stay near-linear (all three operators are user-key aggregates
/ joins with no corpus window).

Run under the steal protocol like every marathon:

    python tools/steal_sample.py -- python tools/stress_events.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

import go_map_reduce_spark  # noqa: E402,F401
from go_map_reduce_spark.catalog import load_table  # noqa: E402
from go_map_reduce_spark.registry import QUERIES, release_caches  # noqa: E402
from go_map_reduce_spark.session import get_spark  # noqa: E402
from tools.stress_scale import timed_force  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = [1, 2, 4, 8]
USER_STRIDE = 1_000_000  # far above any real user_id
EVENT_STRIDE = 100_000_000


def build_events_dir(spark, mult: int, root: str) -> str:
    """mult disjoint replicas of the base events table (shifted user
    and event ids, identical timestamps/types/values) written as one
    parquet dir shaped like an sf_dir."""
    d = os.path.join(root, f"x{mult}")
    os.makedirs(d, exist_ok=True)
    ev = load_table(spark, BASE, "events")
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(r * EVENT_STRIDE)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(r * USER_STRIDE)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for r in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def main() -> None:
    spark = get_spark(app_name="stress-events")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="gmrs_stress_events_")
    base_users = (
        load_table(spark, BASE, "events").select("user_id").distinct().count()
    )
    print(f"base: {BASE}  users={base_users}")
    print("| mult | n_events | sessions | t_sessions | dialog_docs | "
          "t_dialog | kanon_rows | t_kanon |")
    print("|---|---|---|---|---|---|---|---|")
    try:
        for m in MULTS:
            d = build_events_dir(spark, m, root)
            n_ev = spark.read.parquet(os.path.join(d, "events.parquet")).count()
            ns, t_s = timed_force(lambda: QUERIES["user_sessions"](spark, d))
            release_caches(); spark.catalog.clearCache()
            nd, t_d = timed_force(
                lambda: QUERIES["session_dialog_corpus"](spark, d)
            )
            release_caches(); spark.catalog.clearCache()
            nk, t_k = timed_force(
                lambda: QUERIES["kanonymity_cohort_release"](spark, d)
            )
            release_caches(); spark.catalog.clearCache()
            print(f"| {m} | {n_ev} | {ns} | {t_s} | {nd} | {t_d} | "
                  f"{nk} | {t_k} |", flush=True)
            # linear-output invariant: replicas are disjoint and
            # byte-identical per user, so sessions and dialog docs
            # must be EXACTLY mult * the 1x figures
            if m == 1:
                base_ns, base_nd = ns, nd
            else:
                assert ns == m * base_ns, (m, ns, base_ns)
                assert nd == m * base_nd, (m, nd, base_nd)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
