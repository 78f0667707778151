"""The registered pandas UDFs must agree with the native-expression
formulations of the same semantics (UDFs are the escape hatch, native
expressions the hot path — they must not drift)."""

from pyspark.sql import functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.udf_registry import register_udfs


def test_sql_udfs_match_native(spark, sf_dir):
    register_udfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udf")
    rows = spark.sql(
        """
        SELECT doc_id,
               gmrs_token_count(text) AS udf_count,
               size(filter(split(text, '[^A-Za-z]+'), x -> x != '')) AS native_count,
               size(gmrs_tokenize(text)) AS udf_tok_size
        FROM docs_udf
        """
    ).collect()
    assert rows
    for r in rows:
        assert r["udf_count"] == r["native_count"] == r["udf_tok_size"]


def test_quality_udf_range(spark, sf_dir):
    register_udfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    vals = [
        r["q"]
        for r in docs.select(F.expr("gmrs_quality(text)").alias("q")).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
