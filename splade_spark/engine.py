"""High-level facade: documents -> logical postings -> BM25 run.

This is the *logical* (uncompressed) path used for correctness
checks and DuckDB oracle parity. The materialized path (compressed
posting blocks in the snapshot-committed index table) lives in
``operators.index_build`` / ``operators.index_query`` and is tested
for equivalence against this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_spark import DOC_SCALE, TOPK_DEFAULT
from splade_spark.functions.bm25 import weighted_postings
from splade_spark.functions.tokenize import tokenize_docs
from splade_spark.operators.retrieval import (
    quantized_query_terms,
    query_terms,
    score_postings,
    score_postings_quantized,
)
from splade_spark.sources.pages import load_documents
from splade_spark.synth import derive_queries


def logical_postings(documents: DataFrame, cache: bool = True) -> DataFrame:
    """(term, doc_id, tf, dl, df, impact) from a documents table.

    The exploded (doc, term) relation feeds three consumers (stats,
    document frequencies, the postings themselves); caching the single
    tokenize pass collapses what would otherwise be repeated scans +
    explodes of the corpus (at production scale this relation is a
    materialized segment table instead — operators/index_build.py).
    """
    tok = tokenize_docs(documents)
    if cache:
        tok = tok.persist()
    dterms = (
        tok.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dls = tok.select("doc_id", "dl")
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


def bm25_run_quantized(
    documents: DataFrame,
    queries: DataFrame | None = None,
    k: int = TOPK_DEFAULT,
    doc_scale: int = DOC_SCALE,
) -> DataFrame:
    """(qid, doc_id, score long, rank): the quantized-arithmetic run —
    uint8 doc impacts (round(impact * 100) clip 255, the in-index
    quant_bytes convention, codec.quantize) x quantized query weights
    (x50 clip 255). This is the score PISA computes on the reference's
    exported index; integer arithmetic makes it hash-exact across
    engines by construction.

    Rounding-convention note: F.round here is HALF_UP while the
    in-index quant_bytes use np.rint (half-to-even) and the DuckDB
    twin rounds half-away — the three agree because BM25 impacts are
    irrational products (log/ratio arithmetic) whose x100 multiples
    never land exactly on .5 in float64 (the sql_oracle
    quantized_run_sql note); any doc where they could diverge would
    need impact*100 to be an exact half-integer, which the impact
    formula cannot produce."""
    if queries is None:
        queries = derive_queries(documents)
    d_w = F.least(F.round(F.col("impact") * doc_scale), F.lit(255.0)).cast("int")
    post = (
        logical_postings(documents)
        .select("term", "doc_id", d_w.alias("d_w"))
        .filter(F.col("d_w") > 0)
    )
    return score_postings_quantized(post, quantized_query_terms(queries), k=k)
