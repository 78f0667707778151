"""Round-15 optimization-round pins: memo-aware bench repetitions
(registry.memo_snapshot/memo_grew/memo_restore — r14 verdict item 1),
the admit-state tmpdir lifecycle (r14 ADVICE), the encode_wav
non-integer-sample guard (r14 ADVICE), and the kmeans assignment
dimension guard (r14 ADVICE)."""

import os
import struct
import tempfile

import pytest

from go_map_reduce_spark.registry import (
    _SHARED_FRAMES,
    memo_grew,
    memo_restore,
    memo_snapshot,
    shared_frame,
)
from go_map_reduce_spark.streaming import admit


def test_memo_restore_evicts_only_state_built_after_snapshot(spark):
    """Between best-of reps the bench evicts exactly the state the
    previous rep built: new shared frames, new admit state dirs, new
    catalog tables/temp views — state from EARLIER queries survives
    (first-consumer billing is paid once per suite, not per rep)."""
    pre_calls = []

    def build_pre():
        pre_calls.append(1)
        return spark.range(1).localCheckpoint(eager=True)

    shared_frame(spark, "t:memo_pre", build_pre)
    snap = memo_snapshot(spark)
    assert not memo_grew(spark, snap)

    new_calls = []

    def build_new():
        new_calls.append(1)
        return spark.range(3).localCheckpoint(eager=True)

    shared_frame(spark, "t:memo_new", build_new)
    d = tempfile.mkdtemp(prefix="gmrs_test_admit_")
    admit._ADMIT_STATE_DIRS[("test-app", "x", "fp")] = d
    spark.range(2).createOrReplaceTempView("memo_probe_view")
    assert memo_grew(spark, snap)

    counts = memo_restore(spark, snap)
    assert counts["frames"] == 1
    assert counts["state_dirs"] == 1
    assert counts["tables"] >= 1
    assert not os.path.isdir(d), "evicted admit state dir must be removed"
    assert ("test-app", "x", "fp") not in admit._ADMIT_STATE_DIRS
    assert not any(k[1] == "t:memo_new" for k in _SHARED_FRAMES)
    assert any(k[1] == "t:memo_pre" for k in _SHARED_FRAMES)
    assert "memo_probe_view" not in [
        t.name for t in spark.catalog.listTables()
    ]

    # after restore the builder genuinely re-runs (the rep re-pays the
    # build — the whole point of memo-aware repetitions)
    shared_frame(spark, "t:memo_new", build_new)
    assert new_calls == [1, 1]
    assert pre_calls == [1]
    memo_restore(spark, snap)


def test_shared_frame_durable_mode_and_rebuild_on_loss(
    spark, tmp_path, monkeypatch
):
    """r14 verdict item 6: with SPARK_GRAFT_SHARED_DURABLE_DIR set the
    built frame is spilled to parquet under <dir>/<applicationId>/ and
    the memo serves a read of that location; losing the location
    triggers a REBUILD from source, not a failing scan.  Locations are
    applicationId-namespaced and removed at exit — never a cross-run
    cache."""
    import shutil

    from go_map_reduce_spark.registry import (
        _SHARED_DURABLE_LOC,
        invalidate_shared,
    )

    monkeypatch.setenv("SPARK_GRAFT_SHARED_DURABLE_DIR", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return spark.range(7).localCheckpoint(eager=True)

    df = shared_frame(spark, "t:durable", build)
    assert calls == [1]
    assert df.count() == 7
    app = spark.sparkContext.applicationId
    locs = [v for k, v in _SHARED_DURABLE_LOC.items() if k[1] == "t:durable"]
    assert len(locs) == 1 and app in locs[0]
    assert os.path.isdir(locs[0]), "durable parquet location missing"
    # memo hit: no rebuild, same location
    assert shared_frame(spark, "t:durable", build).count() == 7
    assert calls == [1]
    # loss of the location -> rebuild from source
    shutil.rmtree(locs[0])
    df2 = shared_frame(spark, "t:durable", build)
    assert calls == [1, 1]
    assert df2.count() == 7
    invalidate_shared("t:durable")


def test_admit_state_cleanup_hook_removes_all_dirs():
    """r14 ADVICE: the memoized state dirs must be removed at process
    exit (the atexit hook) instead of accumulating in /tmp."""
    d1 = tempfile.mkdtemp(prefix="gmrs_test_admit_")
    d2 = tempfile.mkdtemp(prefix="gmrs_test_admit_")
    admit._ADMIT_STATE_DIRS[("a", "1", "f")] = d1
    admit._ADMIT_STATE_DIRS[("a", "2", "f")] = d2
    admit._cleanup_admit_state_dirs()
    assert not admit._ADMIT_STATE_DIRS
    assert not os.path.isdir(d1) and not os.path.isdir(d2)


def test_encode_wav_rejects_non_integer_samples():
    """r14 ADVICE: the numpy fast path must not silently truncate float
    samples — struct.pack('<h', 1.5) raises, so encode_wav must too."""
    from go_map_reduce_spark.operators.multimodal import encode_wav

    with pytest.raises(struct.error):
        encode_wav(1, 8000, [[1.5]])
    # integer-valued floats are still non-integers to struct.pack
    with pytest.raises(struct.error):
        encode_wav(1, 8000, [[2.0]])
    # plain ints keep working bit-for-bit
    out = encode_wav(1, 8000, [[1], [-2]])
    assert out[:4] == b"RIFF"
    assert struct.pack("<2h", 1, -2) in out


def test_pq_assign_vec_matches_exploded_twin(spark, sf_dir):
    """r15: the PQ Lloyd assignment was rewritten from
    explode+join+window to the broadcast in-row decimal fold (the r14
    kmeans pattern per subspace) — pin bit-exact equality against the
    retained exploded twin through two full Lloyd rounds on real
    data."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= S.PQ_N_QUERY)
    pe = corpus.select(
        "vec_id", F.posexplode("embedding").alias("p", "fval")
    ).select(
        "vec_id",
        (F.col("p") / S.PQ_SUBDIM).cast("int").alias("m"),
        (F.col("p") % S.PQ_SUBDIM).alias("sd"),
        F.col("fval").cast("double").alias("val"),
    )
    sub = S._pq_sub_view(corpus)
    c = pe.where(F.col("vec_id") < S.PQ_N_QUERY + S.PQ_K).select(
        (F.col("vec_id") - S.PQ_N_QUERY).alias("cid"), "m", "sd", "val"
    )

    def upd(assigned):
        return (
            pe.join(assigned, ["vec_id", "m"])
            .groupBy("cid", "m", "sd")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("val")
            )
        )

    for rnd in range(2):
        a_new = sorted(
            map(tuple, S._pq_assign_vec(sub, c).collect())
        )
        a_old = sorted(
            map(tuple, S._pq_assign_exploded(pe, c).collect())
        )
        assert a_new == a_old, f"assignment diverged at round {rnd}"
        assert a_new, "empty assignment"
        c = upd(S._pq_assign_vec(sub, c)).localCheckpoint(eager=True)


def test_kmeans_assign_vec_rejects_dimension_mismatch(spark):
    """r14 ADVICE: zip_with pads a length mismatch with nulls (silent
    wrong answer vs the exploded twin) — the guard must raise instead."""
    from pyspark.errors import SparkRuntimeException

    from go_map_reduce_spark.operators.kmeans import _spark_assign_vec

    v = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "vec_id long, varr array<double>"
    )
    c = spark.createDataFrame(
        [(0, 1, 0.0), (0, 2, 0.0)], "cid long, d long, val double"
    )
    with pytest.raises(SparkRuntimeException, match="vector length"):
        _spark_assign_vec(v, c).collect()

    # matching dimensions keep working
    v2 = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, varr array<double>"
    )
    rows = _spark_assign_vec(v2, c).collect()
    assert rows[0]["cid"] == 0
