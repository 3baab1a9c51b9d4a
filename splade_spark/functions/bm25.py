"""BM25 impact weighting — the engine's scoring model (north rule).

Replaces the reference's neural sparse weights
(log(1+relu(max_t logits)), indexing.py:66-73) with deterministic
BM25: the *pipeline semantics* (sparse doc vector -> postings ->
dot-product score, loss.py:3-14 ``(a*b).sum(-1)``) are identical.

Constants pinned (FIXTURES.md §6): k1=0.9, b=0.4.
idf  = ln(1 + (N - df + 0.5)/(df + 0.5))          (Lucene-style, >=0)
w_dt = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
score(q,d) = sum_t q_tf * w_dt                     (double throughout)

All column expressions — JVM-side, codegen; the identical formula is
emitted as ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splade_spark import B, K1


def idf_col(df_col: Column, n_docs: Column) -> Column:
    return F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tf_sat_col(tf: Column, dl: Column, avgdl: Column) -> Column:
    return (tf.cast("double") * F.lit(K1 + 1.0)) / (
        tf.cast("double")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl.cast("double") / avgdl)
    )


def impact_col(tf: Column, dl: Column, df_col: Column, n: Column, avgdl: Column) -> Column:
    """Query-independent per-(term,doc) BM25 weight — what the posting
    lists store (analog of the reference's float32 impact values,
    inverted_index.py:50-51)."""
    return idf_col(df_col, n) * tf_sat_col(tf, dl, avgdl)


def corpus_stats(doc_lens: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) over ALL documents — (doc_id, dl) input
    (empty docs count toward N and avgdl, matching the oracle SQL)."""
    return doc_lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def term_df(doc_terms_df: DataFrame) -> DataFrame:
    """(term, df) document frequencies."""
    return doc_terms_df.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def weighted_postings(doc_terms_df: DataFrame, doc_lens: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl, df, impact) — the logical posting relation.

    Joins are broadcast where the side is provably small (stats is one
    row; term_df is vocab-sized, small relative to postings but can be
    large at web scale — left to Catalyst/AQE there).
    """
    stats = corpus_stats(doc_lens)
    dfs = term_df(doc_terms_df)
    return (
        doc_terms_df.join(F.broadcast(stats))
        .join(dfs, "term")
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            "df",
            impact_col(
                F.col("tf"), F.col("dl"), F.col("df"), F.col("n_docs"), F.col("avgdl")
            ).alias("impact"),
        )
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle). Same formula text, double precision.
# ---------------------------------------------------------------------------

SQL_IDF = "ln(1.0 + (CAST({n} AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))"
SQL_TF_SAT = (
    "(CAST({tf} AS DOUBLE) * {k1_plus1}) / "
    "(CAST({tf} AS DOUBLE) + {k1} * ({one_minus_b} + {b} * CAST({dl} AS DOUBLE) / {avgdl}))"
)


def sql_impact(tf: str, dl: str, df: str, n: str, avgdl: str) -> str:
    idf = SQL_IDF.format(n=n, df=df)
    sat = SQL_TF_SAT.format(
        tf=tf,
        dl=dl,
        avgdl=avgdl,
        k1=repr(K1),
        k1_plus1=repr(K1 + 1.0),
        one_minus_b=repr(1.0 - B),
        b=repr(B),
    )
    return f"({idf}) * ({sat})"
