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


def test_minhash_bucket_cap(spark):
    """A cluster of identical docs lands whole in every LSH band
    bucket (B^2 pairs); bucket_cap drops those buckets while genuine
    near-dup pairs (small buckets) survive."""
    from splade_spark.operators.dedup import minhash_lsh_pairs

    n_clone = 30
    rows = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
            for i in range(n_clone)]
    # one genuine near-dup pair, distinct from the clone text
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(docs, min_est=0.5)
    assert uncapped.count() >= n_clone * (n_clone - 1) // 2

    capped = minhash_lsh_pairs(docs, min_est=0.5, bucket_cap=10).collect()
    pairs = sorted((r.a, r.b) for r in capped)
    assert (100, 101) in pairs                      # near-dup survives
    assert all(a >= 100 for a, _ in pairs)          # clone cluster gone


def test_simhash_bucket_cap(spark):
    """Identical docs share every simhash chunk — each cluster is B^2
    join rows per chunk uncapped; the cap drops those buckets while a
    small-bucket near-dup pair survives."""
    from splade_spark.operators.dedup import simhash_pairs

    n_clone = 30
    rows = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
            for i in range(n_clone)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = simhash_pairs(docs, max_hamming=8)
    assert uncapped.count() >= n_clone * (n_clone - 1) // 2

    capped = simhash_pairs(docs, max_hamming=8, bucket_cap=10).collect()
    pairs = sorted((r.a, r.b) for r in capped)
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs)


def test_embedding_bucket_cap(spark):
    """An identical-embedding cluster fills one LSH bucket (B^2 join
    rows); the cap drops it while a distinct near-dup pair survives."""
    from pyspark.sql import functions as F

    from splade_spark.operators.ann import embedding_dup_pairs

    n_clone = 30
    clone = [1.0, 0.5, -0.25, 0.75]
    rows = [(i, clone) for i in range(n_clone)]
    rows.append((100, [-1.0, 0.4, 0.8, -0.3]))
    rows.append((101, [-1.0, 0.41, 0.79, -0.3]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = embedding_dup_pairs(emb, min_cos=0.95, dim=4)
    assert uncapped.count() >= n_clone * (n_clone - 1) // 2

    capped = embedding_dup_pairs(emb, min_cos=0.95, dim=4, bucket_cap=10).collect()
    pairs = sorted((r.a, r.b) for r in capped)
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs)
