"""Training-pair mining: split a retrieval run into positives and
hard negatives against qrels.

Reference: generate_datasets.py:66-81 — for each query's top-100
retrieved docs, docs matching the judged positive become positives,
the rest negatives; the positive-in-negatives exclusion
(data/data.py:104 ``neg = [x for x in neg if x not in pos]``) is the
anti-join. Both are plain joins here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_pairs(run: DataFrame, qrels: DataFrame, top_n: int = 100) -> DataFrame:
    """(qid, doc_id, rank, score, is_pos): judged-positive flag per
    retrieved doc within top_n (left join ⇒ unjudged = negative)."""
    rel = qrels.filter(F.col("rel") >= 1).select("qid", "doc_id", "rel")
    return (
        run.filter(F.col("rank") <= top_n)
        .join(rel, ["qid", "doc_id"], "left")
        .select(
            "qid",
            "doc_id",
            "rank",
            "score",
            F.when(F.col("rel").isNotNull(), 1).otherwise(0).alias("is_pos"),
        )
    )


def hard_negatives(run: DataFrame, qrels: DataFrame, top_n: int = 100) -> DataFrame:
    """(qid, doc_id, rank, score): top-ranked docs that are NOT judged
    relevant — the anti-join pattern."""
    rel = qrels.filter(F.col("rel") >= 1).select("qid", "doc_id")
    return (
        run.filter(F.col("rank") <= top_n)
        .join(rel, ["qid", "doc_id"], "left_anti")
        .select("qid", "doc_id", "rank", "score")
    )
