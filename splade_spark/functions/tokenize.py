"""Deterministic tokenizer — the engine's analog of the reference's
HF tokenizer + MLM encode (indexing.py:49-58,66-73).

The hot path is pure JVM column expressions (whole-stage codegen,
no Python): lowercase, split on non-alphanumeric runs, drop empties.
This exact spec is mirrored in the DuckDB oracle SQL
(``regexp_split_to_array(lower(text),'[^a-z0-9]+')`` + filter), so
engine and oracle tokenize byte-identically.

``encode_sparse`` is the SPLADE-shaped surface: a vectorized
pandas UDF mapping text -> map<term, tf> sparse vector (the
reference's dense [B, vocab] logits reduced to nonzeros,
task/evaluator.py:114-115). Kept for API parity; the relational
pipeline uses the exploded form directly.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from splade_spark import TOKEN_SPLIT_RE

_PY_SPLIT = re.compile(TOKEN_SPLIT_RE)


def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens; JVM-side, codegen-friendly."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def tokenize_docs(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, tokens, dl) — dl is the BM25 document length."""
    return documents.select(
        F.col(id_col),
        tokens_col("text").alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_terms(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exploded (id, dl, term, tf) — the index 'shuffle feed'
    (reference nonzero extraction, task/evaluator.py:114-115)."""
    tok = tokenize_docs(documents, id_col)
    return (
        tok.select(id_col, "dl", F.explode("tokens").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def py_tokenize(text: str) -> list[str]:
    """Python twin of tokens_col — used by the numpy oracle and the
    pandas-UDF encoder; must stay in lockstep with tokens_col."""
    return [t for t in _PY_SPLIT.split(text.lower()) if t]


@pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
def encode_sparse(texts: pd.Series) -> pd.Series:
    """text -> {term: tf} sparse vector (Arrow-batched, no per-row
    Python at the Spark boundary)."""
    return texts.map(lambda t: dict(Counter(py_tokenize(t or ""))))
