"""High-level facade: documents -> logical postings -> BM25 run.

This is the *logical* (uncompressed) path used for correctness
checks and DuckDB oracle parity. The materialized path (compressed
posting blocks in the snapshot-committed index table) lives in
``operators.index_build`` / ``operators.index_query`` and is tested
for equivalence against this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from splade_spark import TOPK_DEFAULT
from splade_spark.functions.bm25 import weighted_postings
from splade_spark.functions.tokenize import doc_terms, tokenize_docs
from splade_spark.operators.retrieval import query_terms, score_postings
from splade_spark.sources.pages import load_documents
from splade_spark.synth import derive_queries


def logical_postings(documents: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl, df, impact) from a documents table."""
    dterms = doc_terms(documents)
    dls = tokenize_docs(documents).select("doc_id", "dl")
    return weighted_postings(dterms, dls)


def bm25_run(
    documents: DataFrame,
    queries: DataFrame | None = None,
    k: int = TOPK_DEFAULT,
) -> DataFrame:
    """(qid, doc_id, score, rank) ranked run. Queries default to the
    deterministic derived set (synth.derive_queries)."""
    if queries is None:
        queries = derive_queries(documents)
    post = logical_postings(documents).select("term", "doc_id", "impact")
    return score_postings(post, query_terms(queries), k=k)


def bm25_run_sf(spark: SparkSession, sf_dir: str, k: int = TOPK_DEFAULT) -> DataFrame:
    return bm25_run(load_documents(spark, sf_dir), k=k)
