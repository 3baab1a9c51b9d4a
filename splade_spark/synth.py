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


GRADE_OFFSETS = [(0, 3), (1, 1), (2, 0)]  # (doc_id offset from qid, grade)


def derive_qrels_graded(documents: DataFrame) -> DataFrame:
    """(qid, doc_id, rel): TREC-style graded judgments — the source
    doc is highly relevant (3), its successor marginally relevant (1),
    the next judged non-relevant (0); offsets pointing past the corpus
    are dropped. Deterministic and mirrored in SQL_QRELS_GRADED."""
    grades = F.array(
        *[
            F.struct(F.lit(o).alias("o"), F.lit(r).alias("rel"))
            for o, r in GRADE_OFFSETS
        ]
    )
    g = (
        documents.filter(F.col("doc_id") % QID_STRIDE == 0)
        .select(F.col("doc_id").alias("qid"), F.explode(grades).alias("g"))
        .select(
            "qid",
            (F.col("qid") + F.col("g.o")).alias("doc_id"),
            F.col("g.rel").alias("rel"),
        )
    )
    return g.join(documents.select("doc_id"), "doc_id", "left_semi").select(
        "qid", "doc_id", "rel"
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


def _graded_values() -> str:
    return ", ".join(f"({o}, {r})" for o, r in GRADE_OFFSETS)


SQL_QRELS_GRADED = f"""
SELECT qid, doc_id, rel FROM (
  SELECT q.doc_id AS qid, q.doc_id + o.o AS doc_id, o.rel
  FROM documents q, (VALUES {_graded_values()}) o(o, rel)
  WHERE q.doc_id % {QID_STRIDE} = 0
) g WHERE doc_id IN (SELECT doc_id FROM documents)
"""
