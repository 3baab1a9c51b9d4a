"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
of the splade_spark engine; ``oracle_sql()`` holds its ANSI-SQL twin
(DuckDB) built in ``splade_spark.sql_oracle`` so engine and oracle
share tokenizer/BM25 constants.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_spark import sql_oracle
from splade_spark.engine import bm25_run, logical_postings
from splade_spark.functions.bm25 import corpus_stats, term_df
from splade_spark.functions.tokenize import doc_terms, tokenize_docs
from splade_spark.operators.metrics import mrr_at_k, per_query_metrics, recall_at_k
from splade_spark.operators.retrieval import query_terms
from splade_spark.sources.pages import load_documents
from splade_spark.synth import derive_qrels, derive_queries

TOPK_K = 10


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 ranked run over the derived query set."""
    return bm25_run(load_documents(spark, "/root/testdata/sf0.001"), k=TOPK_K)


# --- query builders (spark, sf_dir) -> DataFrame ---------------------------


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_run(load_documents(spark, sf_dir), k=TOPK_K)


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    dterms = doc_terms(docs)
    dls = tokenize_docs(docs).select("doc_id", "dl")
    stats = corpus_stats(dls)
    agg = dterms.agg(
        F.countDistinct("term").alias("vocab_size"),
        F.count("*").alias("nnz"),
    )
    return stats.join(agg).select(
        "n_docs", F.round("avgdl", 6).alias("avgdl"), "vocab_size", "nnz"
    )


def q_term_df_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = term_df(doc_terms(load_documents(spark, sf_dir)))
    return dfs.orderBy(F.desc("df"), F.asc("term")).limit(100)


def q_doc_lens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize_docs(load_documents(spark, sf_dir)).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def q_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    post = logical_postings(load_documents(spark, sf_dir))
    return post.groupBy("term", F.col("df").alias("posting_len")).agg(
        F.round(F.max("impact"), 6).alias("max_impact"),
        F.round(F.sum("impact"), 6).alias("sum_impact"),
    )


def q_query_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    qt = query_terms(derive_queries(load_documents(spark, sf_dir)))
    return qt.select("qid", "term", F.col("q_tf").cast("long").alias("q_tf"))


def _run_and_qrels(spark: SparkSession, sf_dir: str):
    docs = load_documents(spark, sf_dir)
    return bm25_run(docs, k=TOPK_K), derive_qrels(docs)


def q_mrr10(spark: SparkSession, sf_dir: str) -> DataFrame:
    run, qrels = _run_and_qrels(spark, sf_dir)
    return mrr_at_k(run, qrels, k=10)


def q_recall10(spark: SparkSession, sf_dir: str) -> DataFrame:
    run, qrels = _run_and_qrels(spark, sf_dir)
    return recall_at_k(run, qrels, k=10)


def q_per_query_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    run, qrels = _run_and_qrels(spark, sf_dir)
    pq = per_query_metrics(run, qrels, k=10)
    return pq.select("qid", F.round("rr", 6).alias("rr"), F.round("recall", 6).alias("recall"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "corpus_stats": q_corpus_stats,
        "term_df_top": q_term_df_top,
        "doc_lens": q_doc_lens,
        "posting_stats": q_posting_stats,
        "query_terms": q_query_terms,
        "mrr_at_10": q_mrr10,
        "recall_at_10": q_recall10,
        "per_query_metrics": q_per_query_metrics,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": sql_oracle.bm25_topk_sql(TOPK_K),
        "corpus_stats": sql_oracle.CORPUS_STATS_SQL,
        "term_df_top": sql_oracle.TERM_DF_TOP_SQL,
        "doc_lens": sql_oracle.DOC_LENS_SQL,
        "posting_stats": sql_oracle.POSTING_STATS_SQL,
        "query_terms": sql_oracle.QUERY_TERMS_SQL,
        "mrr_at_10": sql_oracle.mrr_sql(10),
        "recall_at_10": sql_oracle.recall_sql(10),
        "per_query_metrics": sql_oracle.PER_QUERY_METRICS_SQL,
    }
