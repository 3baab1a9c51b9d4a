"""Retrieval evaluation as DataFrame ops — the engine's pytrec_eval.

Mirrors reference evaluate.py semantics:
- mrr_k (evaluate.py:11-18): mean over judged queries of
  1/rank of the first relevant doc within top-k, 0 if none.
- recall_k (evaluate.py:20-31 via pytrec_eval): mean over judged
  queries of |retrieved@k ∩ relevant| / |relevant|.
Ranks are the run's rank column (induced by (-score, doc_id), the
ordering pytrec_eval derives from the score map, run.json
task/evaluator.py:256-258).

qrels: (qid, doc_id, rel). The reference dispatches binary vs graded
judgment sets (evaluate.py:58-63: MS MARCO binary for mrr/recall,
TREC graded for ndcg/ndcg_cut via pytrec_eval) — mirrored here:
binary metrics binarize at ``rel >= rel_threshold``; ``ndcg_at_k``
consumes the grades directly with trec_eval's linear-gain formula.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _judged(qrels: DataFrame, rel_threshold: int = 1) -> DataFrame:
    return qrels.filter(F.col("rel") >= rel_threshold)


def per_query_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, rr, recall) for every judged query (left join: queries
    with no retrieved relevant get rr=0, recall=0)."""
    rel = _judged(qrels)
    n_rel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hits = (
        run.filter(F.col("rank") <= k)
        .join(rel.select("qid", "doc_id"), ["qid", "doc_id"])
        .groupBy("qid")
        .agg(
            F.min("rank").alias("best_rank"),
            F.count("*").alias("n_hit"),
        )
    )
    return (
        n_rel.join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0)).alias("rr"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")).alias("recall"),
        )
    )


def mrr_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row: (metric='mrr@k', value) averaged over judged queries."""
    pq = per_query_metrics(run, qrels, k)
    return pq.agg(
        F.lit(f"mrr@{k}").alias("metric"),
        F.round(F.avg("rr"), 6).alias("value"),
    )


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    pq = per_query_metrics(run, qrels, k)
    return pq.agg(
        F.lit(f"recall@{k}").alias("metric"),
        F.round(F.avg("recall"), 6).alias("value"),
    )


def recall_at_cutoffs(
    run: DataFrame,
    qrels: DataFrame,
    ks: Sequence[int] = (10, 100, 1000),
    rel_threshold: int = 1,
) -> DataFrame:
    """(metric, value) — one row per cutoff, mean recall over judged
    queries (pytrec_eval 'recall' multi-cut semantics, evaluate.py:
    20-31). The run must be at least as deep as max(ks).

    One join + one agg produce ALL cutoffs: per-query hit counts are
    conditional sums over rank, so adding cutoffs costs no extra pass
    over the run."""
    rel = _judged(qrels, rel_threshold)
    n_rel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hits = (
        run.join(rel.select("qid", "doc_id"), ["qid", "doc_id"])
        .groupBy("qid")
        .agg(
            *[
                F.sum((F.col("rank") <= k).cast("int")).alias(f"h{k}")
                for k in ks
            ]
        )
    )
    pq = n_rel.join(hits, "qid", "left")
    means = pq.agg(
        *[
            F.round(
                F.avg(F.coalesce(F.col(f"h{k}"), F.lit(0)) / F.col("n_rel")), 6
            ).alias(f"r{k}")
            for k in ks
        ]
    )
    stack = ", ".join(f"'recall@{k}', r{k}" for k in ks)
    return means.selectExpr(f"stack({len(ks)}, {stack}) AS (metric, value)")


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row: (metric='ndcg@k', value) — trec_eval/pytrec_eval
    ndcg_cut semantics over GRADED judgments (evaluate.py:58-63 routes
    TREC's graded qrel.json here): linear gain rel/log2(rank+1), ideal
    DCG from all positively-judged docs sorted by grade; queries with
    judgments but no positive grades score 0."""
    pos = qrels.filter(F.col("rel") > 0)
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(pos, ["qid", "doc_id"])
        .groupBy("qid")
        .agg(F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    iw = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        pos.withColumn("rn", F.row_number().over(iw))
        .filter(F.col("rn") <= k)
        .groupBy("qid")
        .agg(F.sum(F.col("rel") / F.log2(F.col("rn") + 1)).alias("idcg"))
    )
    base = qrels.select("qid").distinct()
    per_q = (
        base.join(dcg, "qid", "left")
        .join(ideal, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
    )
    return per_q.agg(
        F.lit(f"ndcg@{k}").alias("metric"),
        F.round(F.avg("ndcg"), 6).alias("value"),
    )
