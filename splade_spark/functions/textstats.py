"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID heuristic, document fingerprinting.

All pure column expressions (JVM, codegen) with exact DuckDB twins in
sql_oracle.py. No reference analog (SPLADE consumes pre-cleaned
MS MARCO); these are the ops a Common-Crawl-scale corpus needs before
indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_spark.functions.hashing import md5_int
from splade_spark.functions.tokenize import tokens_col

# BPE-ish pretokenizer: letter/digit runs or single non-space symbol
BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on", "with", "as", "at", "by", "or", "an", "be", "this", "that", "from"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "se", "las", "por", "una", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "für", "auf", "des", "ein", "eine"],
    "fr": ["le", "la", "les", "et", "des", "en", "un", "du", "une", "que", "est", "dans", "qui", "pour"],
}

FP_MOD = (1 << 61) - 1


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars)."""
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    quality): length/punct/stopword heuristics + a logistic composite."""
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    punct_chars = F.length(F.regexp_replace(F.col("text"), "[a-z0-9A-Z\\s]", ""))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    punct_ratio = F.round(punct_chars / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6)
    mean_tok = F.round(alpha_chars / F.greatest(n_tokens, F.lit(1)), 6)
    quality = F.round(
        1.0
        / (
            1.0
            + F.exp(
                -(
                    2.0 * stop_ratio
                    + 0.1 * F.log(1.0 + n_tokens)
                    - 4.0 * punct_ratio
                )
            )
        ),
        6,
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok.alias("mean_token_len"),
        quality.alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score): stopword-profile argmax;
    'und' when no profile matches. Tie rule: (-score, lang asc)."""
    toks = tokens_col(F.col("text"))
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    scores = []
    def contains(arr):
        return lambda t: F.array_contains(arr, t)

    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, contains(arr)))
        scores.append(
            F.struct(
                F.round(hits / n_tokens, 6).alias("score"), F.lit(lang).alias("lang")
            )
        )
    # argmax with comparator: descending score, ascending lang on ties
    best = F.element_at(
        F.array_sort(
            F.array(*scores),
            lambda a, b: F.when(a["score"] > b["score"], -1)
            .when(a["score"] < b["score"], 1)
            .otherwise(
                F.when(a["lang"] < b["lang"], -1)
                .when(a["lang"] > b["lang"], 1)
                .otherwise(0)
            ),
        ),
        1,
    )
    return documents.select(
        "doc_id",
        F.when(best["score"] > 0.0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["score"].alias("lang_score"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fp_xor, fp_sum): position-salted content fingerprints —
    xor and mod-sum of md5(pos:token). Order-sensitive through the
    position salt, associative so distribution-safe."""
    posed = documents.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "term")
    ).select(
        "doc_id",
        md5_int(F.concat(F.col("pos").cast("string"), F.lit(":"), F.col("term"))).alias(
            "h"
        ),
    )
    return posed.groupBy("doc_id").agg(
        F.expr("bit_xor(h)").alias("fp_xor"),
        F.pmod(F.sum("h"), F.lit(FP_MOD)).cast("long").alias("fp_sum"),
    )
