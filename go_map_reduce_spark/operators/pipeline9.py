"""Round-5 pipeline operators, fourth batch: BPE-style merge training,
NOT IN null-semantics probe, and schema-evolution reads.

`bpe_merge_training` is the flagship: the iterative pair-count → merge
loop every subword tokenizer trainer runs (Sennrich et al. 2016),
executed distributively at the token level. The merge APPLICATION is a
greedy left-to-right fold — the part naive implementations get wrong
with string replace (non-overlapping replace drops every second merge
in runs like "a a a a") — expressed as a sequential higher-order fold
that both engines define identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# BPE merge training (token-level, fixed rounds)
# --------------------------------------------------------------------------

BPE_ROUNDS = 3
_SEP = "\x1f"  # merge glue; raw tokens are \s+-split so can never contain it

_SQL_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def _sql_apply_merge(col: str, pair_cte: str) -> str:
    """Greedy left-to-right application of the round's winning pair
    (a, b): fold token-by-token, merging whenever the accumulator ends
    with token a and the next token is b. Merged tokens glue with
    chr(31), so a freshly merged 'a<US>b' can't immediately re-merge as
    an 'a' (exactly BPE's behavior: in 'a a a a' two pairs merge, not
    three). list_reduce seeds with the first element; the Spark twin
    seeds aggregate() with element_at(toks, 1) to match."""
    return f"""
      list_reduce({col}, (acc, x) ->
        CASE WHEN (acc = {pair_cte}.a OR ends_with(acc, ' ' || {pair_cte}.a))
                  AND x = {pair_cte}.b
             THEN acc || chr(31) || x
             ELSE acc || ' ' || x END)
    """


def _sql_round(prev: str, it: int) -> str:
    """One unrolled training round: count adjacent pairs, pick the
    (count desc, pair asc) winner, re-tokenize with it applied."""
    return f"""
    pairs{it} AS (
      SELECT t[p] AS a, t[p+1] AS b, COUNT(*) AS n
      FROM (SELECT t, unnest(range(1, len(t))) AS p FROM {prev})
      GROUP BY t[p], t[p+1]
    ),
    win{it} AS (
      SELECT a, b, n FROM pairs{it} ORDER BY n DESC, a, b LIMIT 1
    ),
    c{it} AS (
      SELECT regexp_split_to_array({_sql_apply_merge('t', f'win{it}')}, ' ') AS t
      FROM {prev} CROSS JOIN win{it}
      WHERE len(t) >= 1
    )"""


@query(
    "bpe_merge_training",
    oracle=f"""
    WITH c0 AS (
      SELECT {_SQL_TOKS} AS t FROM documents WHERE len({_SQL_TOKS}) >= 1
    ),
    {','.join(_sql_round(f'c{i}', i + 1) for i in range(BPE_ROUNDS))}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {i + 1} AS round, a || ' ' || b AS pair, CAST(n AS BIGINT) AS n FROM win{i + 1}"
          for i in range(BPE_ROUNDS)
      )}
    )
    """,
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style merge training over the corpus ({BPE_ROUNDS} rounds):
    each round counts ADJACENT TOKEN PAIRS corpus-wide, adopts the most
    frequent as a merge rule (ties: lexicographic), and re-tokenizes
    with it applied — the exact train loop of subword tokenizers,
    lifted from characters-in-words to tokens-in-documents. Returns
    the learned merge table (round, pair, count).

    Distributed shape per round: pair extraction is a per-row zip of
    the token array with its own tail (no explode until the count),
    the count is one map-side-combinable shuffle on the pair key, the
    winner is a 1-row aggregate the driver collects (the same
    driver-side fixpoint probe as dedup_clusters' convergence count —
    one tiny action per round), and the merge application is a NARROW
    per-row fold, no shuffle. At 100 TB each round is therefore one
    aggregation over the corpus plus one map pass — the canonical
    implementation (Hugging Face tokenizers' trainer does exactly
    this per worker-shard).

    The greedy fold matters: applying merges with non-overlapping
    string replace silently drops every second merge in runs
    ('a a a a' must yield TWO merged pairs); the sequential
    left-to-right fold (Spark `aggregate`, DuckDB `list_reduce` —
    both defined as in-order folds, the functions/vector.py
    discipline) reproduces trainer semantics and is engine-identical,
    which is what the unrolled SQL oracle proves.

    The learned table is memoized via registry.shared_frame (r14): the
    corpus-tokenize pass, this query, and any other consumer train
    ONCE per context instead of re-running the {BPE_ROUNDS}-round loop
    per call — the pipeline32 deployed/retrained-chain convention
    applied to the base trainer."""
    from go_map_reduce_spark.registry import shared_frame

    return shared_frame(
        spark,
        f"bpe_merges:{sf_dir}",
        lambda: _bpe_train_plan(spark, sf_dir).localCheckpoint(eager=True),
        data_path=sf_dir,
    )


def _bpe_train_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    cur = (
        load_table(spark, sf_dir, "documents")
        .select(toks.alias("t"))
        .where(F.size("t") >= 1)
    )
    out_rows = []
    for rnd in range(1, BPE_ROUNDS + 1):
        pairs = (
            cur.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("pr")
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        win = pairs.orderBy(F.desc("n"), "a", "b").first()
        if win is None:
            # corpus degenerated to single-token sequences: no pairs
            # left to merge — stop emitting rounds (the SQL oracle's
            # empty win{it} CTEs degrade identically)
            break
        a, b, n = win["a"], win["b"], int(win["n"])
        out_rows.append((rnd, f"{a} {b}", n))
        merged = F.aggregate(
            F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
            F.element_at(F.col("t"), 1),
            lambda acc, x: F.when(
                ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a)))
                & (x == F.lit(b)),
                F.concat(acc, F.lit(_SEP), x),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
        # Checkpoint the re-tokenized corpus per round (the pipeline32
        # _bpe_train_apply convention): without it round k's pair-count
        # action re-executes every earlier round's merge map from the
        # parquet scan, tripling the trainer's passes at 3 rounds.
        cur = cur.select(F.split(merged, " ").alias("t")).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(out_rows, "round: int, pair: string, n: long")


# --------------------------------------------------------------------------
# NOT IN vs NOT EXISTS under NULLs (three-valued-logic probe)
# --------------------------------------------------------------------------


@query(
    "not_in_null_semantics",
    oracle="""
    WITH keys AS (
      SELECT CASE WHEN s_suppkey % 3 = 0 THEN NULL
                  ELSE s_nationkey END AS k
      FROM supplier
    )
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT k FROM keys)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_nationkey))
              AS BIGINT)
        AS n_not_exists,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL))
              AS BIGINT)
        AS n_not_in_nullfree
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NOT EXISTS divergence under NULLs, pinned by
    execution on BOTH engines: a NULL in the subquery makes
    `x NOT IN (...)` UNKNOWN for every x (three-valued logic), so
    n_not_in = 0, while NOT EXISTS — the form ETL code almost always
    means — still filters per-key; stripping NULLs restores agreement
    (n_not_exists = n_not_in_nullfree). The classic silent-wrong-result
    audit row for any SQL surface.

    Plan note: Spark executes the NOT IN branch as a null-aware anti
    join (BroadcastNestedLoopJoin for the null check) — acceptable
    only because the subquery side is a dimension; the NOT EXISTS
    branch is a plain broadcast anti join (the same shape
    customers_without_orders pins in test_plans). Identical SQL text
    runs on both engines."""
    from go_map_reduce_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH keys AS (
          SELECT CASE WHEN s_suppkey % 3 = 0 THEN NULL
                      ELSE s_nationkey END AS k
          FROM supplier
        )
        SELECT
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_nationkey NOT IN (SELECT k FROM keys)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM keys
                                  WHERE keys.k = c.c_nationkey)) AS BIGINT)
            AS n_not_exists,
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_nationkey NOT IN (SELECT k FROM keys
                                          WHERE k IS NOT NULL)) AS BIGINT)
            AS n_not_in_nullfree
        """
    )


# --------------------------------------------------------------------------
# Schema evolution: mergeSchema read across file generations
# --------------------------------------------------------------------------


@query(
    "schema_evolution_read",
    oracle="""
    WITH unioned AS (
      SELECT c_custkey, c_mktsegment, NULL AS loyalty_tier
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment,
             CAST(c_custkey % 3 AS BIGINT) AS loyalty_tier
      FROM customer WHERE c_custkey % 2 = 1
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(loyalty_tier) AS BIGINT) AS n_with_tier,
           CAST(COALESCE(SUM(loyalty_tier), 0) AS BIGINT) AS tier_sum
    FROM unioned GROUP BY c_mktsegment
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations — the lake reality that
    old files lack columns newer writers added. Two parquet
    generations are written from customer (v1: two columns; v2: adds
    loyalty_tier), then read back as ONE dataset with
    `mergeSchema=true`: Spark unions the footers' schemas and
    null-fills the missing column in v1 files — no rewrite of old
    data. The aggregate proves both generations flow through one scan
    (counts per segment) and that the evolved column is NULL exactly
    for v1 rows.

    At 100 TB this is the append-only evolution path: new columns cost
    nothing on existing files. (Type CHANGES, by contrast, need
    per-file casts or a rewrite — out of scope for footer merging.)
    The writes land in a deterministic temp dir (overwrite mode:
    re-running the query is idempotent — the driver executes queries
    more than once)."""
    import os
    import tempfile

    # path scoped by the Spark application id: two concurrent sessions
    # (bench + pytest, parallel CI jobs) can never overwrite each
    # other's generations mid-scan, while repeat executions within one
    # session still reuse (and idempotently overwrite) the same dir
    root = os.path.join(tempfile.gettempdir(), "gmrs_schema_evolution")
    app_id = spark.sparkContext.applicationId
    # best-effort cleanup of STALE sessions' dirs, else every run leaves
    # its generations in /tmp forever. Staleness = dir untouched for 6 h:
    # a live concurrent session's dir is minutes old, so this never
    # deletes under an active writer (deleting by app-id != ours alone
    # would — a foreign id can belong to a session that is still alive)
    try:
        import shutil
        import time

        cutoff = time.time() - 6 * 3600
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            if entry != app_id and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    base = os.path.join(root, app_id, os.path.basename(sf_dir.rstrip("/")))
    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_mktsegment"
    )
    v2 = cust.where(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_custkey") % 3).alias("loyalty_tier"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2")
    )
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("loyalty_tier").alias("n_with_tier"),
        F.coalesce(F.sum("loyalty_tier"), F.lit(0)).cast("long").alias("tier_sum"),
    )
