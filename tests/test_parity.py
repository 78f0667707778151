"""Tests for the MapReduce-parity API: differential vs the sequential
oracle (the reference's own test discipline, main/test-mr.sh:64-101),
plus a property test over random KV datasets, plus byte-parity between
the parity wc app and the native wordcount operator."""

import string

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from go_map_reduce_spark.parity import run_job_df
from go_map_reduce_spark.parity.apps import (
    crash_map,
    file_count_map,
    file_count_reduce,
    indexer_map,
    indexer_reduce,
    sorted_join_reduce,
    wc_map,
    wc_reduce,
)
from go_map_reduce_spark.parity.mapreduce import sequential_oracle
from go_map_reduce_spark.registry import QUERIES


@pytest.fixture(scope="module")
def text_files(spark, tmp_path_factory):
    """Write sf0.001 documents out as one text file per doc — the
    reference's input model (one whole file per map task)."""
    root = tmp_path_factory.mktemp("corpus")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    )
    paths = []
    for r in docs:
        p = root / f"doc-{r['doc_id']:05d}.txt"
        p.write_text(r["text"])
        paths.append(str(p))
    return sorted(paths)


APPS = [
    ("wc", wc_map, wc_reduce),
    ("indexer", indexer_map, indexer_reduce),
    ("file_count", file_count_map, file_count_reduce),
    ("crash_data", crash_map, sorted_join_reduce),
]


@pytest.mark.parametrize("name,mapf,reducef", APPS, ids=[a[0] for a in APPS])
def test_app_matches_sequential_oracle(name, mapf, reducef, spark, text_files):
    got = {
        r["key"]: r["value"]
        for r in run_job_df(spark, mapf, reducef, text_files, n_reduce=5).collect()
    }
# wholeTextFiles yields "file:<path>" URIs — feed the oracle the same names
    named = [(f"file:{p}", open(p).read()) for p in text_files]
    want = sequential_oracle(mapf, reducef, named)
    assert got == want


def test_parity_wc_equals_native_wordcount(spark, text_files):
    """The parity-API wc app and the native DataFrame wordcount operator
    agree on the same corpus (the internal analog of test-mr.sh:90's
    sort|cmp between distributed and sequential runs)."""
    parity = {
        r["key"]: int(r["value"])
        for r in run_job_df(spark, wc_map, wc_reduce, text_files, n_reduce=5).collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("_pairty_docs")
    from go_map_reduce_spark.functions.texttok import exploded_tokens
    from pyspark.sql import functions as F

    native = {
        r["word"]: r["cnt"]
        for r in exploded_tokens(docs.select("text"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert parity == native


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.text(string.ascii_lowercase, min_size=1, max_size=3),  # skewed keys
            st.text(string.ascii_letters + string.digits, max_size=6),
        ),
        max_size=200,
    )
)
def test_runjob_property_random_kv(spark, data, tmp_path_factory):
    """Property: for any KV dataset and an order-insensitive reduce,
    run_job == sequential oracle. Identity map over a synthetic file set."""
    root = tmp_path_factory.mktemp("kv")
    # split records across 3 "files"; map emits the file's records
    files = []
    for i in range(3):
        chunk = data[i::3]
        p = root / f"part-{i}.txt"
        p.write_text("\n".join(f"{k}\t{v}" for k, v in chunk))
        files.append(str(p))

    def kv_map(filename, contents):
        return [
            tuple(line.split("\t", 1))
            for line in contents.splitlines()
            if "\t" in line
        ]

    got = {
        r["key"]: r["value"]
        for r in run_job_df(
            spark, kv_map, sorted_join_reduce, files, n_reduce=3
        ).collect()
    }
    want = sequential_oracle(
        kv_map, sorted_join_reduce, [(p, open(p).read()) for p in files]
    )
    assert got == want
