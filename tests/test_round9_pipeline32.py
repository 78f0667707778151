"""Round-9, third batch: tokenizer drift of the daily batch.

The report must reconcile exactly with the carve-out (every non-empty
doc in exactly one population row-set), be internally consistent
(delta = batch − standing to rounding; merge rates are valid
permilles), sit near zero on the iid carve-out baseline, and ALARM on
a genuinely alien batch (unseen-vocabulary replay drives the batch
merge rate to zero)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.operators.pipeline20 import (
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["tokenizer_batch_drift"](spark, sf_dir),
        ORACLES["tokenizer_batch_drift"],
        sf_dir,
    )


def test_populations_reconcile_and_metrics_consistent(spark, sf_dir):
    rows = QUERIES["tokenizer_batch_drift"](spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    nonempty = docs.where(F.size(toks) >= 1)
    is_new = (F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM
    by_lang = {
        (r["lang"], r["new"]): r["n"]
        for r in nonempty.groupBy("lang", is_new.alias("new"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_docs_standing"] == by_lang[(r["lang"], False)], r
        assert r["n_docs_batch"] == by_lang[(r["lang"], True)], r
        assert abs(
            r["delta_tpw"] - (r["tpw_batch"] - r["tpw_standing"])
        ) < 2e-6, r
        assert 0 <= r["merge_rate_standing_permille"] <= 1000, r
        assert 0 <= r["merge_rate_batch_permille"] <= 1000, r
        # post-merge fertility can only shrink words into fewer tokens
        assert 0 < r["tpw_standing"] <= 1.0 and 0 < r["tpw_batch"] <= 1.0, r
        # iid carve-out baseline: the batch is a same-distribution
        # slice, so fertility drift stays small — headroom for alarms
        assert abs(r["delta_tpw"]) < 0.05, r


def test_alien_batch_trips_the_alarm(spark, sf_dir):
    """Replace the batch's text with vocabulary the standing corpus
    never produced: the deployed merges must stop firing on the batch
    (merge rate 0, fertility exactly 1.0) while the standing baseline
    is unchanged — replayed through the oracle SQL so the alarm is
    pinned on the same single definition of the metric."""
    con = duckdb.connect()
    con.sql(
        f"""CREATE VIEW documents AS
        SELECT doc_id, lang,
               CASE WHEN doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}
                    THEN 'zq' || CAST(doc_id AS VARCHAR) || ' zz' ||
                         CAST(doc_id AS VARCHAR) || ' zx zx'
                    ELSE text END AS text
        FROM '{sf_dir}/documents.parquet'"""
    )
    rows = con.sql(ORACLES["tokenizer_batch_drift"]).fetchall()
    assert rows
    # columns: lang, nds, ndb, tpw_s, tpw_b, delta, mr_s, mr_b
    for r in rows:
        assert r[7] == 0, r  # no deployed merge fires on alien text
        assert r[4] == 1.0, r  # fertility exactly 1 token per word
        assert r[6] > 0, r  # standing baseline still merging
