"""Empirical stress measurement of the dedup/ANN scale caps.

The engine's 100 TB story for near-dup detection rests on two claims
that until now were argued from plan inspection only (r06 verdict,
"Next round" task 2):

1. candidate-pair work is Sum_buckets b*min(b, cap), LINEAR in corpus
   size — not Sum b^2, quadratic — because over-cap buckets are routed
   to template handling instead of pairwise verification
   (LSH_BUCKET_CAP in operators/dedup.py, PURITY_BUCKET_CAP in
   operators/pipeline18.py);
2. wall time of the registered operators therefore stays near-linear
   even when LSH buckets genuinely degenerate.

This script MEASURES both: it synthesizes corpora at 1x/2x/4x/8x the
sf0.1 documents table — replicated with salted doc_ids, plus a
boilerplate slice (~30% of docs rewritten to near-identical template
text, differing only in a short alphabetic suffix) so that band
buckets blow far past LSH_BUCKET_CAP=64 — writes each corpus to a
temp sf-dir, runs the REGISTERED operators on it verbatim
(minhash_near_dup_pairs, lsh_template_clusters,
incremental_dedup_new_batch, knn_label_purity_ann), and reports per
scale: bucket degeneracy, the ANALYTIC uncapped pair count
(Sum b*(b-1)/2 — what a capless implementation would have joined),
the executed capped candidate count, and wall seconds per operator.

Run:  python tools/stress_scale.py [--mults 1,2,4,8]
Prints a markdown table (recorded in PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("STRESS_BASE_SF_DIR", "/root/testdata/sf0.1")
BOILER_FRAC = 30  # percent of docs rewritten to near-identical template
SALT = 10_000_000  # doc_id offset per replica

BOILERPLATE = (
    "this site uses cookies to improve your browsing experience by "
    "continuing to browse you agree to our use of cookies read our "
    "privacy policy and terms of service for more information about "
    "how we collect store and process your personal data contact our "
    "support team with questions variant"
)


def build_stress_dir(spark, mult: int, root: str) -> str:
    """Write a mult-x stress corpus (documents + embeddings) under
    root/ and return the directory. Replicas salt doc_id/vec_id; the
    boilerplate slice rewrites text to the template plus a per-doc
    alphabetic suffix (same shingles except the tail, so MinHash bands
    collide corpus-wide — the degenerate-bucket scenario the caps
    exist for)."""
    out = os.path.join(root, f"x{mult}")
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    # Replicas must be DISTINCT documents, not near-dups of one another
    # (exact replication would grow the TRUE pair count quadratically by
    # construction, drowning the signal): each replica r > 0 weaves an
    # alphabetic rep token between every pair of words, which puts that
    # token in every 3-shingle — replica shingle sets are disjoint, so
    # base-corpus near-dup structure replicates LINEARLY. The
    # boilerplate slice, by contrast, deliberately collides ACROSS
    # replicas (no rep token): that is the degenerate mass the caps
    # must absorb, and it grows quadratically in the uncapped column.
    # Suffix words must be ALPHABETIC: the dedup shingle tokenizer
    # splits on [^A-Za-z]+, so a digit-bearing suffix like 'filler7'
    # would collapse to 'filler' for every doc, turning the boilerplate
    # slice into exact duplicates instead of near-identical variants.
    # chr(97+k) keeps each of the 23 variants a distinct token.
    suffix = F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.col("doc_id") % 5).cast("int")),
                lambda i: F.concat(
                    F.lit("filler"),
                    F.char((F.col("doc_id") % 23 + i) % 26 + 97),
                ),
            ),
            " ",
        ),
    )
    frames = []
    for rep in range(mult):
        letter = chr(97 + rep)  # [^A-Za-z]+ tokenizer: must be alphabetic
        var_text = (
            F.col("text")
            if rep == 0
            else F.regexp_replace("text", r"\s+", f" zz{letter}q ")
        )
        frames.append(
            docs.select(
                (F.col("doc_id") + rep * SALT).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 100 < BOILER_FRAC,
                    F.concat(F.lit(BOILERPLATE), suffix),
                )
                .otherwise(var_text)
                .alias("text"),
                "lang",
                # the capstone funnel runs the FULL registered pipeline,
                # whose gate/split stages read source and n_chars —
                # carry source through and recompute n_chars on the
                # REWRITTEN text (the base value would lie for the
                # boilerplate/rep-token variants)
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    stress_docs = frames[0]
    for f_ in frames[1:]:
        stress_docs = stress_docs.unionByName(f_)
    emb_frames = [
        emb.select(
            (F.col("vec_id") + rep * SALT).alias("vec_id"),
            "embedding",
            "label",
        )
        for rep in range(mult)
    ]
    stress_emb = emb_frames[0]
    for f_ in emb_frames[1:]:
        stress_emb = stress_emb.unionByName(f_)
    stress_docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    stress_emb.write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def bucket_profile(spark, sf_dir: str) -> dict:
    """Band-bucket degeneracy + the analytic capless pair count."""
    from go_map_reduce_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        _doc_shingle_sets,
        _spark_bands,
        _spark_signatures,
    )

    docsets = _doc_shingle_sets(spark, sf_dir)
    bands = _spark_bands(_spark_signatures(docsets))
    sizes = bands.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("b"))
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("b").alias("max_bucket"),
        F.sum((F.col("b") > LSH_BUCKET_CAP).cast("long")).alias("n_overcap"),
        F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("uncapped_pairs"),
        F.sum(
            F.when(
                F.col("b") <= LSH_BUCKET_CAP, F.col("b") * (F.col("b") - 1) / 2
            ).otherwise(0)
        ).alias("capped_candidates_analytic"),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}


def timed_count(df_or_thunk) -> tuple[int, float]:
    t0 = time.perf_counter()
    df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
    n = df.count()
    return n, round(time.perf_counter() - t0, 2)


def timed_force(df_or_thunk) -> tuple[int, float]:
    """Timed execution that forces EVERY output column (the r09
    count-vs-noop lesson: .count() on an aggregate-final query lets
    Catalyst prune the measure expressions and times an emptier
    plan). hash(*) over all columns is the noop-sink equivalent.

    Accepts a zero-arg THUNK as well as a frame: several operators
    build shared frames eagerly (localCheckpoint) at
    DataFrame-CONSTRUCTION time, so timing only the action on an
    already-constructed frame misses the dominant cost (the r11
    sweep's own blind-spot lesson — t_xcodec read 0.23 s after the
    decode moved into a construction-time shared frame).  Pass
    ``lambda: QUERIES[name](spark, d)`` to start the clock before
    construction."""
    t0 = time.perf_counter()
    df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
    row = df.agg(
        F.sum(F.hash(*df.columns).cast("long")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return int(row["n"]), round(time.perf_counter() - t0, 2)


def capstone_funnel(spark, sf_dir: str) -> tuple[list[list], float, int]:
    """Run the registered end-to-end curation capstone on a stress
    corpus and return (per-split funnel rows, wall seconds, straddling
    verified pairs). The funnel shows whether the cut stage absorbs
    the injected cross-replica boilerplate (tokens_cut tracking the
    boilerplate mass) and the dedup stage the replicated near-dup
    structure; the straddle count re-proves the leakage guarantee —
    no VERIFIED near-dup pair may cross the train/val boundary — on
    corpora whose clusters are orders of magnitude more degenerate
    than the test tables'."""
    from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs
    from go_map_reduce_spark.operators.pipeline26 import leakage_safe_split
    from go_map_reduce_spark.registry import QUERIES

    t0 = time.perf_counter()
    funnel = sorted(
        QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect(),
        key=lambda r: r["split"],
    )
    wall = round(time.perf_counter() - t0, 2)
    split = leakage_safe_split(spark, sf_dir).select("doc_id", "split")
    pairs = minhash_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    straddle = (
        pairs.join(
            split.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            split.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    rows = [
        [
            r["split"], r["docs_in"], r["gate_dropped"], r["dedup_dropped"],
            r["media_dropped"], r["docs_kept"], r["docs_cut"],
            r["tokens_cut"], r["tokens_kept"], r["n_sequences"],
        ]
        for r in funnel
    ]
    return rows, wall, straddle


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,4,8")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from go_map_reduce_spark.registry import (
        QUERIES,
        invalidate_shared,
        release_caches,
    )
    from go_map_reduce_spark.session import get_spark

    spark = get_spark(
        app_name="stress-scale", master="local[16]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="gmrs_stress_")

    cols = (
        "mult n_docs n_buckets max_bucket n_overcap uncapped_pairs "
        "capped_cand verified_pairs t_minhash template_rows t_template "
        "new_rows t_incr knn_rows t_knn cut_tokens_removed t_cut "
        # r10 daily-batch/index/multimodal additions (timed with
        # timed_force — all aggregate-final). Upsert runs before
        # compaction, the realistic suite order: compaction then rides
        # the shared frozen-centroid frame the upsert built.
        "t_upsert t_compact xcodec_groups t_xcodec t_retrain t_bfunnel "
        "t_audio "
        # r11 additions: the survivor act runs AFTER the two cluster
        # reports (realistic suite order — it rides their shared
        # decoded frames), the shift tier pays its own encode+decode
        "t_shift t_letterbox t_survivors"
    ).split()
    print("| " + " | ".join(cols) + " |")
    print("|" + "|".join("---" for _ in cols) + "|")
    cap_rows: list[list] = []
    for m in mults:
        d = build_stress_dir(spark, m, root)
        n_docs = spark.read.parquet(
            os.path.join(d, "documents.parquet")
        ).count()
        prof = bucket_profile(spark, d)
        pairs, t_pairs = timed_count(lambda: QUERIES["minhash_near_dup_pairs"](spark, d))
        release_caches()
        tmpl, t_tmpl = timed_count(lambda: QUERIES["lsh_template_clusters"](spark, d))
        release_caches()
        newb, t_newb = timed_count(
            lambda: QUERIES["incremental_dedup_new_batch"](spark, d)
        )
        release_caches()
        knn, t_knn = timed_count(lambda: QUERIES["knn_label_purity_ann"](spark, d))
        release_caches()
        # .count() alone would let Catalyst ELIMINATE the cut pipeline's
        # final left join (unique right key, no columns needed) and time
        # an empty plan; summing n_removed forces the full execution
        t0 = time.perf_counter()
        cut_df = QUERIES["substring_dup_cut"](spark, d)
        cut = int(
            cut_df.agg(F.sum("n_removed").alias("s")).first()["s"] or 0
        )
        t_cut = round(time.perf_counter() - t0, 2)
        release_caches()
        _, t_ups = timed_force(lambda: QUERIES["ivf_index_upsert"](spark, d))
        release_caches()
        _, t_cmp = timed_force(lambda: QUERIES["ivf_index_compaction"](spark, d))
        release_caches()
        xg, t_xc = timed_force(lambda: QUERIES["image_cross_codec_dedup"](spark, d))
        release_caches()
        _, t_rt = timed_force(lambda: QUERIES["tokenizer_retrain_recovery"](spark, d))
        release_caches()
        _, t_bf = timed_force(lambda: QUERIES["curation_funnel_bucketed"](spark, d))
        release_caches()
        _, t_au = timed_force(lambda: QUERIES["audio_layout_dedup"](spark, d))
        release_caches()
        _, t_sh = timed_force(lambda: QUERIES["audio_shift_dedup"](spark, d))
        release_caches()
        _, t_lb = timed_force(lambda: QUERIES["image_letterbox_dedup"](spark, d))
        release_caches()
        _, t_sv = timed_force(lambda: QUERIES["media_dedup_survivors"](spark, d))
        release_caches()
        row = [
            m, n_docs, prof["n_buckets"], prof["max_bucket"],
            prof["n_overcap"], prof["uncapped_pairs"],
            prof["capped_candidates_analytic"], pairs, t_pairs,
            tmpl, t_tmpl, newb, t_newb, knn, t_knn, cut, t_cut,
            t_ups, t_cmp, xg, t_xc, t_rt, t_bf, t_au, t_sh, t_lb, t_sv,
        ]
        print("| " + " | ".join(str(x) for x in row) + " |", flush=True)
        frows, t_e2e, straddle = capstone_funnel(spark, d)
        release_caches()
        # Shared-frame keys embed the scale dir, so eviction never fires
        # by key collision when the sweep advances to the next multiple;
        # without an explicit drop every earlier SF's localCheckpoint
        # blocks (cc_hashed/aud_fp/staged) stay pinned MEMORY_AND_DISK
        # and pressure storage memory during the largest-SF measurements
        # (r11 ADVICE).
        invalidate_shared()
        for fr in frows:
            cap_rows.append([m] + fr + [straddle, t_e2e])
    print()
    cap_cols = (
        "mult split docs_in gate_dropped dedup_dropped media_dropped "
        "docs_kept docs_cut tokens_cut tokens_kept n_sequences "
        "straddle_pairs t_e2e"
    ).split()
    print("| " + " | ".join(cap_cols) + " |")
    print("|" + "|".join("---" for _ in cap_cols) + "|")
    for r in cap_rows:
        print("| " + " | ".join(str(x) for x in r) + " |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
