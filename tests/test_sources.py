"""Tests for sources/sinks: whole-file scan, KV JSON parity format,
text sink, and format round-trips."""

import pytest

from pyspark.sql import functions as F

from go_map_reduce_spark.sources.formats import read_table, write_table
from go_map_reduce_spark.sources.text import (
    read_kv_json,
    read_text_lines,
    whole_text_files,
    write_kv_json,
    write_kv_text,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("src_corpus")
    (root / "a.txt").write_text("alpha beta\ngamma")
    (root / "b.txt").write_text("delta")
    return root


def test_whole_text_files(spark, corpus):
    rows = {r["filename"].split("/")[-1]: r["content"]
            for r in whole_text_files(spark, str(corpus)).collect()}
    assert rows == {"a.txt": "alpha beta\ngamma", "b.txt": "delta"}


def test_read_text_lines(spark, corpus):
    df = read_text_lines(spark, str(corpus))
    assert sorted(r["line"] for r in df.collect()) == [
        "alpha beta", "delta", "gamma",
    ]


def test_kv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k1", "v3")], "key string, value string"
    )
    path = str(tmp_path / "kv")
    write_kv_json(df, path, n_buckets=2)
    back = read_kv_json(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_kv_text_sink(spark, tmp_path):
    df = spark.createDataFrame([("word", "3"), ("other", "1")], "key string, value string")
    path = str(tmp_path / "out")
    write_kv_text(df, path)
    lines = sorted(r["value"] for r in spark.read.text(path).collect())
    assert lines == ["other 1", "word 3"]


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc", "xml"])
def test_format_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.0)], "id long, s string, v double"
    )
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt=fmt)
    schema = "id long, s string, v double" if fmt in ("json", "csv", "xml") else None
    back = read_table(spark, path, fmt=fmt, schema=schema)
    assert sorted(map(tuple, back.select("id", "s", "v").collect())) == sorted(
        map(tuple, df.collect())
    )


def test_schema_inference_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="json")


def test_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, part string"
    )
    path = str(tmp_path / "pt")
    write_table(df, path, partition_by=["part"])
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=a", "part=b"]
    back = read_table(spark, path)
    assert back.where(F.col("part") == "a").count() == 2


def test_binary_file_ingestion(spark, tmp_path):
    """binaryFile ingest → multimodal feature/decode stages compose with
    no shuffle: blobs written to a directory come back byte-identical
    and decode correctly through the media pipeline."""
    import hashlib

    from go_map_reduce_spark.operators.multimodal import decode_image, encode_bmp
    from go_map_reduce_spark.sources.binary import (
        media_features_from_dir,
        read_binary_files,
    )

    blobs = {}
    for i in range(4):
        w, h = 3 + i, 2 + i
        rows = [bytes([(i + y) % 256] * (3 * w)) for y in range(h)]
        blobs[f"img-{i}.bmp"] = encode_bmp(w, h, rows)
    (tmp_path / "noise.txt").write_text("not a blob we want")
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    files = read_binary_files(spark, str(tmp_path), glob="*.bmp")
    got = {r["path"].split("/")[-1]: bytes(r["content"]) for r in files.collect()}
    assert got == blobs  # pathGlobFilter pruned noise.txt; bytes intact

    # decode each ingested payload through the real BMP parser
    for i, name in enumerate(sorted(blobs)):
        w, h, bpp, px = decode_image(got[name])
        assert (w, h, bpp) == (3 + i, 2 + i, 24)

    feats = {
        r["checksum"]: r["n_bytes"]
        for r in media_features_from_dir(spark, str(tmp_path), glob="*.bmp").collect()
    }
    want = {hashlib.md5(p).hexdigest(): len(p) for p in blobs.values()}
    assert feats == want


def test_schema_evolution_merge(spark, tmp_path):
    """Files written under successive schemas read as the union schema
    with nulls for columns absent in older files."""
    from go_map_reduce_spark.sources.formats import read_evolved_parquet

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "y", 3.5)], "id long, a string, b double"
    ).write.mode("append").parquet(path)
    back = read_evolved_parquet(spark, path)
    assert set(back.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in back.collect()}
    assert rows == {1: ("x", None), 2: ("y", 3.5)}


def test_corrupt_record_modes(spark, tmp_path):
    """PERMISSIVE quarantines bad rows in _corrupt_record; DROPMALFORMED
    drops them; FAILFAST raises."""
    import pytest as _pytest

    from go_map_reduce_spark.sources.formats import read_json_with_corrupt_records

    p = tmp_path / "dirty.json"
    p.write_text('{"id": 1, "v": 10}\n{"id": 2 "v": broken}\n{"id": 3, "v": 30}\n')
    path = str(tmp_path)

    permissive = read_json_with_corrupt_records(spark, path, "id long, v long")
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["id"] is None  # quarantined, fields nulled

    dropped = read_json_with_corrupt_records(
        spark, path, "id long, v long", mode="DROPMALFORMED"
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]

    with _pytest.raises(Exception):
        read_json_with_corrupt_records(
            spark, path, "id long, v long", mode="FAILFAST"
        ).collect()


def test_custom_python_datasource(spark, sf_dir):
    """Python DataSource API: split planning yields the requested
    partition count, rows are deterministic, and the registered query
    matches its DuckDB range() oracle."""
    from go_map_reduce_spark.registry import ORACLES, QUERIES
    from go_map_reduce_spark.sources.pydatasource import (
        REPLAY_PARTS,
        register_replay_source,
    )

    from tests.oracle_util import compare

    register_replay_source(spark)
    df = (
        spark.read.format("replay")
        .option("n", "100").option("parts", "5").load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {r["id"]: (r["h"], r["grp"]) for r in df.collect()}
    import hashlib

    assert len(rows) == 100
    assert rows[7] == (hashlib.md5(b"7").hexdigest(), 7)

    full = (
        spark.read.format("replay").load()
    )
    assert full.rdd.getNumPartitions() == REPLAY_PARTS
    compare(
        QUERIES["custom_source_scan"](spark, sf_dir),
        ORACLES["custom_source_scan"],
        sf_dir,
    )


def test_custom_kvtext_sink_commit_protocol(spark, tmp_path):
    """The Python-DataSource sink writes through temp files and commits
    via manifest: part files match the _SUCCESS manifest exactly, no
    temp residue survives, and the rows round-trip."""
    import os

    from pyspark.sql import functions as F

    from go_map_reduce_spark.sources.pydatasource import register_kvtext_sink

    register_kvtext_sink(spark)
    out = str(tmp_path / "kvsink")
    df = spark.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    df.write.format("kvtext").option("path", out).mode("append").save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not any(n.startswith(".tmp-") for n in names)
    manifest = {}
    with open(os.path.join(out, "_SUCCESS")) as f:
        for line in f:
            name, rows = line.strip().split("\t")
            manifest[name] = int(rows)
    parts = [n for n in names if n.startswith("part-")]
    assert sorted(manifest) == parts
    got = []
    for p in parts:
        with open(os.path.join(out, p)) as f:
            lines = f.read().splitlines()
        assert len(lines) == manifest[p]
        got += [tuple(ln.split("\t")) for ln in lines]
    expected = {(f"k{i % 7}", str(i)) for i in range(100)}
    assert set(got) == expected and len(got) == 100


def _read_kv_dir(out):
    import os

    manifest = {}
    with open(os.path.join(out, "_SUCCESS")) as f:
        for line in f:
            name, rows = line.strip().split("\t")
            manifest[name] = int(rows)
    parts = sorted(n for n in os.listdir(out) if n.startswith("part-"))
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as f:
            rows += [tuple(ln.split("\t")) for ln in f.read().splitlines()]
    return manifest, parts, rows


def test_kvtext_sink_overwrite_prunes_stale_parts(spark, tmp_path):
    """mode('overwrite') must not leave parts from a previous wider
    write: a 16-partition write followed by a 2-partition overwrite
    leaves exactly the 2 new files, manifest-matched."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.sources.pydatasource import register_kvtext_sink

    register_kvtext_sink(spark)
    out = str(tmp_path / "kvow")
    wide = spark.range(64).repartition(16).select(
        F.lit("a").alias("k"), F.col("id").cast("string").alias("v")
    )
    wide.write.format("kvtext").option("path", out).mode("overwrite").save()
    narrow = spark.createDataFrame(
        [("x", "1"), ("y", "2")], "k string, v string"
    ).coalesce(1)
    narrow.write.format("kvtext").option("path", out).mode("overwrite").save()
    manifest, parts, rows = _read_kv_dir(out)
    assert sorted(manifest) == parts and len(parts) == 1
    assert sorted(rows) == [("x", "1"), ("y", "2")]


def test_kvtext_sink_append_merges_manifest(spark, tmp_path):
    """Two appends to one directory: job-id-namespaced part names never
    collide and the manifest accumulates both jobs' files."""
    from go_map_reduce_spark.sources.pydatasource import register_kvtext_sink

    register_kvtext_sink(spark)
    out = str(tmp_path / "kvap")
    a = spark.createDataFrame([("a", "1")], "k string, v string").coalesce(1)
    b = spark.createDataFrame([("b", "2")], "k string, v string").coalesce(1)
    a.write.format("kvtext").option("path", out).mode("append").save()
    b.write.format("kvtext").option("path", out).mode("append").save()
    manifest, parts, rows = _read_kv_dir(out)
    assert sorted(manifest) == parts and len(parts) == 2
    assert sorted(rows) == [("a", "1"), ("b", "2")]


def test_kvtext_sink_requires_path(spark, tmp_path):
    import pytest as _pytest

    from go_map_reduce_spark.sources.pydatasource import register_kvtext_sink

    register_kvtext_sink(spark)
    df = spark.createDataFrame([("a", "1")], "k string, v string")
    with _pytest.raises(Exception, match="path"):
        df.write.format("kvtext").mode("append").save()
