"""Dtype-strict differential check — stricter than tests/oracle_util.py.

The driver's correctness gate hashes cell values WITHOUT the int64
normalization that tests/oracle_util.compare applies, so a DuckDB
HUGEINT sum surfacing as pandas float64 ("1677.0") hash-mismatches a
Spark bigint ("1677") even when the values agree.  This script replays
the driver's comparison shape: run each query and its oracle at
sf0.01, canonicalize ONLY ordering (rows sorted, columns by name), and
compare repr()s of cells — any dtype skew shows up as a value diff.

Usage: python tools/strict_gate_check.py [name ...]   (default: queries
with no green row in any CORRECTNESS_r*.json)
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from go_map_reduce_spark.catalog import TABLES  # noqa: E402
from go_map_reduce_spark.registry import ORACLES, QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _cell(x):
    import datetime

    if x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x)):
        return "NULL"
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, datetime.datetime):
        return x.isoformat()
    if isinstance(x, datetime.date):
        return x.isoformat()
    if hasattr(x, "tolist") and not isinstance(x, str):
        return repr([_cell(v) for v in x.tolist()])
    if isinstance(x, (list, tuple)):
        return repr([_cell(v) for v in x])
    return repr(x)


def _rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_cell(v) for v in rec) for rec in df.itertuples(index=False)]
    return sorted(rows)


def _ungated() -> list[str]:
    """Queries the driver's gate will actually (re-)check: never-evidenced
    plus stale-evidence — taken from the gate's OWN logic so this tool
    can't diverge from the window it claims to replay."""
    import __spark_entry__ as gate

    valid, _stale = gate._evidenced()
    return [n for n in QUERIES if n not in valid]


def main() -> int:
    names = sys.argv[1:] or _ungated()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from go_map_reduce_spark.registry import release_caches

    n_fail = 0
    for name in names:
        # free the previous query's tracked persists (caller-owned
        # lifecycle) regardless of how that query exited
        release_caches()
        spark.catalog.clearCache()
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        try:
            actual = QUERIES[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"{name}: rows-only ({len(actual)} rows)"
                  + (" EMPTY!" if len(actual) == 0 else ""))
            if len(actual) == 0:
                n_fail += 1
            continue
        try:
            expected = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
        if a_cols != e_cols:
            print(f"{name}: SCHEMA spark={a_cols} oracle={e_cols}")
            n_fail += 1
            continue
        ra, re_ = _rows(actual), _rows(expected)
        if len(ra) != len(re_):
            print(f"{name}: ROWS spark={len(ra)} oracle={len(re_)}")
            n_fail += 1
            continue
        diffs = [(x, y) for x, y in zip(ra, re_) if x != y]
        if diffs:
            print(f"{name}: HASH {len(diffs)} differing rows; first:")
            print(f"   spark : {diffs[0][0]}")
            print(f"   oracle: {diffs[0][1]}")
            n_fail += 1
        else:
            print(f"{name}: OK ({len(ra)} rows)")
    release_caches()
    spark.stop()
    print(f"\n{n_fail} failures / {len(names)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
