"""Retrieval evaluation as DataFrame ops — the engine's pytrec_eval.

Mirrors reference evaluate.py semantics:
- mrr_k (evaluate.py:11-18): mean over judged queries of
  1/rank of the first relevant doc within top-k, 0 if none.
- recall_k (evaluate.py:20-31 via pytrec_eval): mean over judged
  queries of |retrieved@k ∩ relevant| / |relevant|.
Ranks are the run's rank column (induced by (-score, doc_id), the
ordering pytrec_eval derives from the score map, run.json
task/evaluator.py:256-258).

qrels: (qid, doc_id, rel) with binary rel>=1 counted relevant
(generate_datasets.py:30-36, test.py:8-9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _judged(qrels: DataFrame) -> DataFrame:
    return qrels.filter(F.col("rel") >= 1)


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
