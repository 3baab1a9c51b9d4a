"""Lossless Block-Max / MaxScore pruning for the compressed index.

The reference delegates this to the external PISA engine (binary
format produced at pisa_inference/index2pisa.py:59-74; PISA runs
Block-Max WAND / MaxScore on it, pisa_inference/README.md). Here the
same pruning is expressed as ordinary DataFrame joins/filters — no
Catalyst extension.

Two-pass plan (SURVEY.md §4), per query but fully set-based:

Pass 1 (floor): for each query pick the champion term (highest
  ub_t = q_tf * max_impact_t); decode only its blocks. The top-k
  docs by single-term partial become floor CANDIDATES; their exact
  total scores are computed by decoding only the blocks whose
  [first_doc_id, last_doc_id] range contains a candidate (a
  broadcast range join — candidates are <= k per query). With >= k
  candidates exactly scored, theta_q = their k-th largest exact
  score is a valid lower bound of the true k-th score.

Pass 2 (prune + exact): a block b of term t upper-bounds every
  member doc's total score by
     UB(b) = total_ub_q - ub_t + q_tf_t * block_max_b.
  If UB(b) < theta_q the block can contain no top-k doc, and every
  doc with true score >= theta_q keeps ALL its blocks, so surviving
  scores are exact and the top-k is identical to exhaustive scoring
  (proof sketch in docstring of test_maxscore.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from splade_spark import SCORE_THRESHOLD, TOPK_DEFAULT
from splade_spark.operators.index_query import (
    buckets_for_queries,
    decode_blocks_df,
    load_postings,
    load_stats,
    load_term_dict,
)
from splade_spark.operators.retrieval import query_terms, topk_window


def search_maxscore(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOPK_DEFAULT,
    threshold: float = SCORE_THRESHOLD,
    debug_counts: dict | None = None,
) -> DataFrame:
    term_dict = load_term_dict(spark, index_dir)
    postings = load_postings(spark, index_dir)

    qt = (
        query_terms(queries)
        .join(term_dict.select("term", "term_id", "max_impact"), "term")
        .select(
            "qid",
            "term_id",
            "q_tf",
            (F.col("q_tf") * F.col("max_impact")).alias("ub"),
        )
    )
    qt = qt.cache()

    # bucket-literal partition pruning (content-addressed buckets —
    # derived from query tokens, no postings/term_dict pre-scan),
    # then per-term semi restriction
    n_buckets = load_stats(index_dir)["n_buckets"]
    buckets = buckets_for_queries(queries, n_buckets)
    blocks = postings.filter(F.col("bucket").isin(buckets)).join(
        F.broadcast(qt.select("term_id").distinct()), "term_id", "left_semi"
    )
    # per-(query, block) metadata — no bytes, no decode
    blocks_meta = blocks.select(
        "term_id", "block_id", "first_doc_id", "last_doc_id", "block_max"
    ).join(F.broadcast(qt), "term_id")

    # ---- pass 1: champion-term floor ----------------------------------
    champ_w = Window.partitionBy("qid").orderBy(F.desc("ub"), F.asc("term_id"))
    champions = (
        qt.withColumn("rn", F.row_number().over(champ_w)).filter("rn = 1").drop("rn")
    )
    champ_decoded = decode_blocks_df(
        blocks.join(
            F.broadcast(champions.select("term_id").distinct()), "term_id", "left_semi"
        )
    )
    champ_partials = champ_decoded.join(
        F.broadcast(champions.select("qid", "term_id", "q_tf")), "term_id"
    ).select("qid", "doc_id", (F.col("q_tf") * F.col("impact")).alias("partial"))
    kth_w = Window.partitionBy("qid").orderBy(F.desc("partial"), F.asc("doc_id"))
    candidates = (
        champ_partials.withColumn("rn", F.row_number().over(kth_w))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id")
    )
    # exact-score the candidates: decode only blocks whose doc range
    # covers a candidate doc (broadcast NLJ on the tiny candidate set)
    cover_pairs = blocks_meta.alias("b").join(
        F.broadcast(candidates).alias("c"),
        (F.col("b.qid") == F.col("c.qid"))
        & (F.col("c.doc_id") >= F.col("b.first_doc_id"))
        & (F.col("c.doc_id") <= F.col("b.last_doc_id")),
    )
    cover_blocks = blocks.join(
        cover_pairs.select("term_id", "block_id").distinct(),
        ["term_id", "block_id"],
        "left_semi",
    )
    cand_scores = (
        decode_blocks_df(cover_blocks)
        .join(F.broadcast(candidates), "doc_id")
        .join(F.broadcast(qt.select("qid", "term_id", "q_tf")), ["qid", "term_id"])
        .groupBy("qid", "doc_id")
        .agg(F.sum(F.col("q_tf") * F.col("impact")).alias("exact"))
    )
    floors = (
        cand_scores.groupBy("qid")
        .agg(
            F.count("*").alias("m"),
            F.sort_array(F.collect_list("exact"), False).alias("xs"),
        )
        .filter(F.col("m") >= k)
        .select("qid", F.element_at("xs", k).alias("theta"))
    )

    # ---- pass 2: block prune + exact scoring --------------------------
    total_ub = qt.groupBy("qid").agg(F.sum("ub").alias("total_ub"))
    retained_pairs = (
        blocks_meta.join(F.broadcast(total_ub), "qid")
        .join(F.broadcast(floors), "qid", "left")
        .withColumn("theta", F.coalesce(F.col("theta"), F.lit(threshold)))
        .withColumn(
            "block_ub",
            F.col("total_ub") - F.col("ub") + F.col("q_tf") * F.col("block_max"),
        )
        .filter(F.col("block_ub") >= F.col("theta"))
        .select("qid", "term_id", "block_id", "q_tf")
    )
    if debug_counts is not None:
        debug_counts["blocks_total"] = blocks_meta.count()
        debug_counts["blocks_kept"] = retained_pairs.count()

    retained_blocks = blocks.join(
        retained_pairs.select("term_id", "block_id").distinct(),
        ["term_id", "block_id"],
        "left_semi",
    )
    scored = (
        decode_blocks_df(retained_blocks)
        .join(retained_pairs, ["term_id", "block_id"])
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(F.col("q_tf") * F.col("impact")), 6).alias("score"))
        .filter(F.col("score") > F.lit(threshold))
    )
    return topk_window(scored, k)
