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


DL_BUCKET_W = 10


def dl_histogram(documents: DataFrame, width: int = DL_BUCKET_W) -> DataFrame:
    """(bucket_lo, n_docs): document-length histogram in fixed-width
    token buckets — the corpus-profiling stat behind chunking/
    filtering decisions (reference analog: the L0/length stats family,
    task/evaluator.py:112-113). One narrow groupBy; bucket_lo is the
    bucket's inclusive lower bound."""
    dl = F.size(tokens_col(F.col("text")))
    return (
        documents.select(
            (F.floor(dl / width) * width).cast("long").alias("bucket_lo")
        )
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("n_docs"))
    )


PMI_TOP_TERMS = 20


def term_pmi(
    documents: DataFrame, top_n: int = PMI_TOP_TERMS, min_pairs: int = 2
) -> DataFrame:
    """(a, b, n_ab, pmi): pointwise mutual information over co-occurring
    top-df terms — log(N * c_ab / (c_a * c_b)), document-level events.

    Scale: the candidate space is bounded BEFORE the self-join by
    restricting to the ``top_n`` highest-df terms (broadcast set);
    the per-doc self-join then touches at most top_n^2 pairs per doc
    regardless of corpus size. Each (doc, term) is distinct, so pair
    counts are document frequencies of the pair."""
    dterms = (
        documents.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
        ).distinct()
    )
    dfs = dterms.groupBy("term").agg(F.count("*").alias("df"))
    top = dfs.orderBy(F.desc("df"), F.asc("term")).limit(top_n)
    tt = dterms.join(F.broadcast(top), "term")
    # one-row corpus count stays in the plan (broadcast cross join) —
    # no driver action during pipeline construction
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    pairs = (
        tt.alias("x")
        .join(tt.alias("y"), "doc_id")
        .filter(F.col("x.term") < F.col("y.term"))
        .groupBy(F.col("x.term").alias("a"), F.col("y.term").alias("b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    ca = top.select(F.col("term").alias("a"), F.col("df").alias("c_a"))
    cb = top.select(F.col("term").alias("b"), F.col("df").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_docs").cast("double")
                    * F.col("n_ab")
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
