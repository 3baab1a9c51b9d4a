"""Query-time retrieval: broadcast query terms against postings,
accumulate BM25 scores, take per-query top-k.

Reference lifecycle (task/evaluator.py:161-180,241): numba kernel
``scores[doc] += q_w * d_w`` over each query term's posting list,
``scores > threshold`` filter, argpartition top-k (k=1000,
evaluate.py:164). Our plan: equi-join q_terms ⋈ postings ON term
with broadcast(q_terms) (queries ≪ index), hash-aggregate
sum(q_tf * impact) — O(candidates) memory instead of the
reference's dense O(N) accumulator, which cannot exist at 10^12
docs — then a per-query window top-k.

Physical plan at scale: the broadcast join prunes the postings scan
to query-term buckets (Iceberg-style bucket partition pruning);
one shuffle for the score agg, one for the window — both
AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from splade_spark import QUERY_SCALE, SCORE_THRESHOLD, TOPK_DEFAULT
from splade_spark.functions.tokenize import tokens_col


def query_terms(queries: DataFrame, min_tf: int = 0) -> DataFrame:
    """(qid, term, q_tf) — query-side sparse vector. Reference analog:
    query nonzeros (task/evaluator.py:232-233) + term-frequency counts
    (pisa_inference/queries2pisa.py:34-39). ``min_tf`` is the query
    term-frequency threshold (``times[w] > thres``,
    queries2pisa.py:35-49; default keeps all, matching thres=0)."""
    qt = (
        queries.select("qid", F.explode(tokens_col("text")).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").cast("double").alias("q_tf"))
    )
    if min_tf > 0:
        qt = qt.filter(F.col("q_tf") > F.lit(float(min_tf)))
    return qt


def quantized_query_terms(
    queries: DataFrame, scale: int = QUERY_SCALE, clip: int = 255
) -> DataFrame:
    """(qid, term, q_w): reference query-side quantization —
    ``int(w * 50)`` clipped to [0, 255]
    (pisa_inference/inference_q_SPLADE.py:13,60). Query weights here
    are integer term frequencies, so int() truncation is exact."""
    return query_terms(queries).select(
        "qid",
        "term",
        F.least(F.col("q_tf") * scale, F.lit(float(clip))).cast("int").alias("q_w"),
    )


def score_postings_quantized(
    postings_quant: DataFrame, qt_quant: DataFrame, k: int = TOPK_DEFAULT
) -> DataFrame:
    """PISA-parity quantized scoring: integer ``sum(q_w * d_w)`` over
    uint8 impact postings (the arithmetic PISA runs on the exported
    index, index2pisa.py:42-48 + quantized queries). Integer scores
    are hash-exact across engines — no float rounding discipline
    needed. Returns (qid, doc_id, score long, rank)."""
    joined = postings_quant.join(F.broadcast(qt_quant), "term")
    scored = (
        joined.groupBy("qid", "doc_id")
        .agg(F.sum(F.col("q_w") * F.col("d_w")).cast("long").alias("score"))
        .filter(F.col("score") > 0)
    )
    return topk_window(scored, k)


def topk_window(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k: rank by (-score, doc_id).

    The reference's argpartition does not order within k
    (task/evaluator.py:152-159) — rank here is the induced ranking
    pytrec_eval applies; ties broken by doc_id for determinism.
    """
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def score_postings(
    postings: DataFrame,
    q_terms: DataFrame,
    k: int = TOPK_DEFAULT,
    threshold: float = SCORE_THRESHOLD,
) -> DataFrame:
    """Exhaustive scoring over a logical posting relation
    (term, doc_id, impact). Returns (qid, doc_id, score, rank).

    score is rounded to 6dp AFTER ranking-relevant arithmetic — the
    rounded value is both the emitted score and the rank key so the
    DuckDB oracle ranks identically.
    """
    joined = postings.join(F.broadcast(q_terms), "term")
    scored = (
        joined.groupBy("qid", "doc_id")
        .agg(F.round(F.sum(F.col("q_tf") * F.col("impact")), 6).alias("score"))
        .filter(F.col("score") > F.lit(threshold))
    )
    return topk_window(scored, k)
