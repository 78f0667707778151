"""Tests for multimodal plumbing and streaming operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["multimodal_features", "events_hourly_stream", "events_session_windows"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_media_table_schema(spark, sf_dir):
    from go_map_reduce_spark.operators.multimodal import media_table

    mt = media_table(spark, sf_dir)
    dt = dict(mt.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<")
    row = mt.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))


def test_decode_image_is_stubbed():
    from go_map_reduce_spark.operators.multimodal import HAS_PIL, decode_image

    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")


def test_streaming_matches_batch_windows(spark, sf_dir):
    """The streaming tumbling-window result must equal the batch
    formulation of the same aggregation (engine-internal differential)."""
    stream = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_hourly_stream"](spark, sf_dir).collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_hourly_windows"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_stateful_user_totals_oracle(spark, sf_dir):
    compare(
        QUERIES["events_stateful_user_totals"](spark, sf_dir),
        ORACLES["events_stateful_user_totals"],
        sf_dir,
    )


def test_stream_stream_join_oracle(spark, sf_dir):
    compare(
        QUERIES["events_purchase_click_stream_join"](spark, sf_dir),
        ORACLES["events_purchase_click_stream_join"],
        sf_dir,
    )
