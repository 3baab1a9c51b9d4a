"""Deterministic query/qrel synthesis from the corpus itself.

The sandbox has no MS MARCO; FIXTURES.md mandates seed-fixed
synthetic inputs with no external data. Queries are a pure function
of the corpus: every QID_STRIDE-th doc contributes its first
QUERY_PREFIX_LEN tokens as a query (qid = doc_id), guaranteeing
in-vocabulary queries whose source doc is a natural relevant
judgment (qrels: qid -> that doc, rel=1 — binary, one positive per
query, mirroring reference test.py:8-9).

Both the Spark builders here and the DuckDB oracle SQL in
``splade_spark.oracle_sql`` derive the identical set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_spark.functions.tokenize import tokens_col

QID_STRIDE = 23
QUERY_PREFIX_LEN = 5


def derive_queries(documents: DataFrame) -> DataFrame:
    """(qid, text): first QUERY_PREFIX_LEN tokens of every
    QID_STRIDE-th document."""
    return (
        documents.filter(F.col("doc_id") % QID_STRIDE == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(
                F.slice(tokens_col("text"), 1, QUERY_PREFIX_LEN), " "
            ).alias("text"),
        )
    )


def derive_qrels(documents: DataFrame) -> DataFrame:
    """(qid, doc_id, rel=1): the source document is relevant."""
    return documents.filter(F.col("doc_id") % QID_STRIDE == 0).select(
        F.col("doc_id").alias("qid"),
        F.col("doc_id"),
        F.lit(1).alias("rel"),
    )


SQL_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

SQL_QUERIES = f"""
SELECT doc_id AS qid,
       array_to_string(({SQL_TOK})[1:{QUERY_PREFIX_LEN}], ' ') AS text
FROM documents WHERE doc_id % {QID_STRIDE} = 0
"""

SQL_QRELS = f"""
SELECT doc_id AS qid, doc_id, 1 AS rel
FROM documents WHERE doc_id % {QID_STRIDE} = 0
"""
