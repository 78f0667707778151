"""Round-10: acting on tokenizer drift — the retrain operator.

The oracle differential is the main gate; these pin the semantics the
differential can't see: internal identity of the recovery columns, and
the ALARM→REMEDY direction on a constructed alien batch (deployed
merges never fire on unseen content, the standing+batch retrain
recovers a positive merge rate)."""

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.operators.pipeline32 import _bpe_train_apply
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["tokenizer_retrain_recovery"](spark, sf_dir),
        ORACLES["tokenizer_retrain_recovery"],
        sf_dir,
    )


def test_recovery_columns_are_internally_consistent(spark, sf_dir):
    """recovery_* must replay exactly from the two tokenizers' own
    columns (permille: exact integers; tpw: to rounding)."""
    rows = QUERIES["tokenizer_retrain_recovery"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["recovery_permille"] == (
            r["merge_rate_retrained_permille"]
            - r["merge_rate_deployed_permille"]
        ), r
        assert abs(
            r["recovery_tpw"]
            - (r["tpw_batch_deployed"] - r["tpw_batch_retrained"])
        ) < 2e-6, r
        assert r["tpw_batch_deployed"] > 0 and r["tpw_batch_retrained"] > 0


def _mini_corpus(spark, batch_text: str):
    rows = [(False, "en", "the cat sat on the mat")] * 30 + [
        (True, "xx", batch_text)
    ] * 5
    df = spark.createDataFrame(
        rows, "is_new boolean, lang string, text string"
    )
    return (
        df.select(
            "is_new",
            "lang",
            F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t"),
        )
        .where(F.size("t") >= 1)
        .withColumn("n_words", F.size("t"))
    )


def _batch_merge_permille(df) -> int:
    r = (
        df.where("is_new")
        .agg(
            F.sum("n_words").cast("long").alias("nw"),
            F.sum(F.size("t")).cast("long").alias("nt"),
        )
        .first()
    )
    return (r["nw"] - r["nt"]) * 1000 // r["nw"]


def test_retrain_recovers_on_alien_batch(spark):
    """The remedy direction: on a batch whose vocabulary the standing
    corpus has never seen, the DEPLOYED tokenizer's merge rate on the
    batch is exactly zero (none of its merges can fire), while the
    standing+batch RETRAIN picks up the batch's dominant pair and
    recovers a strictly positive merge rate — the measured value of
    shipping the retrain."""
    base = _mini_corpus(spark, " ".join(["zzq"] * 20))
    dep = _bpe_train_apply(base, ~F.col("is_new"))
    ret = _bpe_train_apply(base, F.lit(True))
    assert _batch_merge_permille(dep) == 0
    assert _batch_merge_permille(ret) > 0


def test_retrain_is_noop_when_batch_matches_standing(spark):
    """Calibration: when the batch is drawn from the standing
    distribution (identical text), deployed and retrained tokenizers
    learn the same merges and the recovery is exactly zero."""
    base = _mini_corpus(spark, "the cat sat on the mat")
    dep = _bpe_train_apply(base, ~F.col("is_new"))
    ret = _bpe_train_apply(base, F.lit(True))
    assert _batch_merge_permille(dep) == _batch_merge_permille(ret)
    assert _batch_merge_permille(dep) > 0  # merges DO fire on the batch
