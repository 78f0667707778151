"""Round-4 SQL-surface depth: pipe syntax, SQL UDF inlining, LISTAGG,
dynamic partition pruning."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "sql_pipe_revenue",
    "sql_udf_net_revenue",
    "listagg_nations",
    "dynamic_partition_pruning",
    "sql_session_variable_revenue",
    # r13 extension: the remaining Spark-4 SQL surfaces
    "sql_scripting_segment_above_avg",
    "collated_nation_customers",
]


def test_session_variable_folds_into_scan(spark, sf_dir):
    """The variable reference must fold to a literal at plan time so
    the threshold filter reaches the parquet scan as a pushed filter
    (parameterization can't cost a full scan at 100 TB)."""
    plan = (
        QUERIES["sql_session_variable_revenue"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThan(o_totalprice,150000" in plan, plan


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_sql_udf_is_inlined(spark, sf_dir):
    """A declarative SQL UDF must be inlined by Catalyst: no
    BatchEvalPython / ArrowEvalPython node, whole-stage codegen intact."""
    plan = (
        QUERIES["sql_udf_net_revenue"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # the call site is gone — Catalyst substituted the UDF body
    assert "net_price" not in plan
    assert "* (1.0 - disc" in plan


def test_pipe_syntax_plans_like_nested_sql(spark, sf_dir):
    """Pipe-syntax and nested-SQL forms of the same query produce the
    same physical aggregate shape (pipe syntax is surface syntax, not a
    different engine path)."""
    from go_map_reduce_spark.catalog import register_views

    register_views(spark, sf_dir)
    piped = (
        QUERIES["sql_pipe_revenue"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in piped
    assert piped.count("Exchange") == 1  # one shuffle: partial→final agg


def test_dpp_subquery_in_plan(spark, sf_dir):
    """The fact scan must carry a dynamicpruning subquery on the
    partition column — the broadcast-reuse pruning mechanism."""
    df = QUERIES["dynamic_partition_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_dpp_scan_reads_only_matching_partitions(spark, sf_dir):
    """After execution, the fact scan's partition metrics show only the
    year%3==0 directories were read (pruning happened at runtime, not
    just in the plan text)."""
    import duckdb

    from go_map_reduce_spark.sources.layout import _dpp_paths

    QUERIES["dynamic_partition_pruning"](spark, sf_dir).collect()
    fact_path, _ = _dpp_paths(sf_dir)
    con = duckdb.connect()
    years = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT year(CAST(o_orderdate AS DATE)) "
            f"FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    target = sorted(y for y in years if y % 3 == 0)
    got = sorted(
        r["o_year"]
        for r in QUERIES["dynamic_partition_pruning"](spark, sf_dir).collect()
    )
    assert got == target


def test_listagg_matches_collect_sort(spark, sf_dir):
    """LISTAGG WITHIN GROUP equals the engine's canonical
    sort_array(collect_list) discipline."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table

    expected = {
        r["n_regionkey"]: r["nations"]
        for r in load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
                "nations"
            )
        )
        .collect()
    }
    got = {
        r["n_regionkey"]: r["nations"]
        for r in QUERIES["listagg_nations"](spark, sf_dir).collect()
    }
    assert got == expected


def test_sql_scripting_control_flow(spark, sf_dir):
    """The scripting surface beyond DECLARE/SET: a WHILE loop that
    doubles a threshold until fewer than 10 customers exceed it must
    terminate with exactly the python-computed fixed point (the
    oracle can't express a loop; this pin covers it)."""
    from go_map_reduce_spark.catalog import load_table, register_views

    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    got = spark.sql("""
        BEGIN
          DECLARE thr DOUBLE DEFAULT 100.0;
          WHILE (SELECT COUNT(*) FROM customer WHERE c_acctbal > thr) >= 10 DO
            SET thr = thr * 2.0;
          END WHILE;
          SELECT thr AS threshold,
                 CAST((SELECT COUNT(*) FROM customer WHERE c_acctbal > thr)
                      AS BIGINT) AS n_above;
        END
    """).collect()
    assert len(got) == 1
    bals = [
        r["c_acctbal"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_acctbal")
        .collect()
    ]
    thr = 100.0
    while sum(1 for b in bals if b > thr) >= 10:
        thr *= 2.0
    assert got[0]["threshold"] == thr
    assert got[0]["n_above"] == sum(1 for b in bals if b > thr)
    assert got[0]["n_above"] < 10


def test_collation_join_preserves_casing_and_excludes_unmatched(
    spark, sf_dir
):
    """The collated join must return the TABLE's casing (no lower()
    mangling in the output) and must not match the deliberately
    unmatched dim row."""
    rows = QUERIES["collated_nation_customers"](spark, sf_dir).collect()
    names = {r["n_name"] for r in rows}
    assert names == {"NATION_0", "NATION_7", "NATION_19", "NATION_23"}
    assert all(r["n_customers"] >= 0 for r in rows)


def test_sql_scripting_query_restores_conf(spark, sf_dir):
    """r13 ADVICE: the gated scripting query must not leak
    spark.sql.scripting.enabled into the shared session — it saves and
    restores the previous value (including the unset state) around the
    one spark.sql call that needs it, and the returned frame stays
    collectable after the restore (the plan is already resolved)."""
    try:
        spark.conf.unset("spark.sql.scripting.enabled")
    except Exception:
        pass
    df = QUERIES["sql_scripting_segment_above_avg"](spark, sf_dir)
    assert spark.conf.get("spark.sql.scripting.enabled", None) is None, (
        "conf leaked into the shared session"
    )
    assert df.count() > 0  # resolved plan survives the restore

    # a pre-set value round-trips too
    spark.conf.set("spark.sql.scripting.enabled", "false")
    QUERIES["sql_scripting_segment_above_avg"](spark, sf_dir).count()
    assert spark.conf.get("spark.sql.scripting.enabled") == "false"
    spark.conf.unset("spark.sql.scripting.enabled")
