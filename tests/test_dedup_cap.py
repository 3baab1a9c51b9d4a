"""Hot-shingle df cap: a stopword-saturated corpus must not blow up
the shingle self-join (a shared phrase in d docs is d^2 join rows)."""

from __future__ import annotations

from splade_spark.operators.dedup import ngram_jaccard_pairs

N_DOCS = 50


def _stopword_corpus(spark):
    rows = [
        (i, f"the quick brown unique{i} tail{i} word{i}") for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_removes_quadratic_hot_shingle(spark):
    docs = _stopword_corpus(spark)
    # every doc shares exactly one shingle: 'the quick brown' (df=50)
    uncapped = ngram_jaccard_pairs(docs, min_jaccard=0.0, max_shingle_df=None)
    assert uncapped.count() == N_DOCS * (N_DOCS - 1) // 2
    capped = ngram_jaccard_pairs(docs, min_jaccard=0.0, max_shingle_df=10)
    assert capped.count() == 0


def test_cap_keeps_genuine_near_dups(spark):
    # two real near-duplicates must survive the cap
    rows = [(i, f"the quick brown unique{i}") for i in range(N_DOCS)]
    rows.append((N_DOCS, "alpha beta gamma delta epsilon"))
    rows.append((N_DOCS + 1, "alpha beta gamma delta zeta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, min_jaccard=0.2, max_shingle_df=10).collect()
    assert [(r.a, r.b) for r in pairs] == [(N_DOCS, N_DOCS + 1)]
