"""Differential test for the iterative k-means / IVF assignment."""

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_kmeans_oracle(spark, sf_dir):
    compare(
        QUERIES["kmeans_ivf_assignments"](spark, sf_dir),
        ORACLES["kmeans_ivf_assignments"],
        sf_dir,
    )


def test_kmeans_clusters_nonempty(spark, sf_dir):
    rows = QUERIES["kmeans_ivf_assignments"](spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], 0)
        by_cluster[r["cluster_id"]] += 1
    assert len(rows) > 0
    assert len(by_cluster) >= 2  # Lloyd actually separated something


def test_ivf_probe_oracle(spark, sf_dir):
    compare(QUERIES["ivf_probe_topk"](spark, sf_dir), ORACLES["ivf_probe_topk"], sf_dir)
