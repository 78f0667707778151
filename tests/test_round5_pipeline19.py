"""Round-5 batch 12: watermark sizing, HHI concentration."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["watermark_loss_report", "supplier_concentration_hhi"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_watermark_loss_is_monotone_in_delay(spark, sf_dir):
    """A longer watermark delay can only drop FEWER events; the max
    600 s arrival skew means delays ≥ 600 s drop nothing."""
    rows = sorted(
        QUERIES["watermark_loss_report"](spark, sf_dir).collect(),
        key=lambda r: r["delay_s"],
    )
    assert [r["delay_s"] for r in rows] == [60, 300, 900, 3600]
    n = rows[0]["n_events"]
    assert all(r["n_events"] == n for r in rows)
    drops = [r["n_dropped"] for r in rows]
    assert drops == sorted(drops, reverse=True)
    assert drops[-1] == 0 and drops[-2] == 0  # 900s, 3600s ≥ max skew
    assert drops[0] > 0  # 60s < typical skew: losses exist


def test_hhi_bounds_and_even_market(spark, sf_dir):
    """HHI ∈ (1/n, 1]; for TPC-H-ish data the supplier split per type
    is near-even, so HHI should sit close to 1/n_suppliers."""
    rows = QUERIES["supplier_concentration_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo = 1.0 / r["n_suppliers"]
        assert lo - 1e-9 <= r["hhi"] <= 1.0
        assert r["hhi"] < 3 * lo  # near-even synthetic market
