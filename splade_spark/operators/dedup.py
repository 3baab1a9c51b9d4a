"""Deduplication operators for web-scale training-data pipelines.

Not in the reference (its corpus is pre-deduped MS MARCO) but a core
capability of any 10^12-doc Common-Crawl pipeline. All variants are
pure DataFrame ops over md5-derived hashes (functions/hashing.py) so
each has an exact DuckDB twin.

Scale notes per operator in docstrings — the common theme: never
materialize O(n^2); candidates come from equality joins on content
keys (hash, shingle, band, simhash prefix), which Spark executes as
shuffled hash joins partitioned by the key.

Caching contract: operators that feed one relation into several join
branches persist() it (Catalyst does not reuse exchanges across
branches). The cache lives until the caller's action completes;
long-lived sessions running many operators should clear it between
pipelines (``spark.catalog.clearCache()`` — bench.py does this per
query) or unpersist the returned plan's sources explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from splade_spark.functions.hashing import md5_int
from splade_spark.functions.tokenize import tokens_col

NGRAM_N = 3
MINHASH_SIGS = 16
MINHASH_BANDS = 8  # 2 rows per band
SIMHASH_BITS = 32


def exact_dedup(documents: DataFrame) -> DataFrame:
    """(doc_id, text_hash, canonical_id, is_dup): hash-groupBy exact
    dedup; canonical = min doc_id per hash. One shuffle on the hash."""
    hashed = documents.select(
        "doc_id", F.md5(F.col("text")).alias("text_hash")
    )
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("canonical_id")).cast("int"))
        .select("doc_id", "text_hash", "canonical_id", "is_dup")
    )


def shingle_stream(documents: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, shingle) — one row per n-gram occurrence, built from
    the exploded token stream with window lead()s.

    NOT an array-HOF ``transform(sequence(...), i -> element_at(...))``:
    higher-order-function lambdas are interpreted (outside whole-stage
    codegen), so a tokens-subexpression inside the lambda re-tokenizes
    the full text once per element access — measured ~70x slower than
    this formulation on the sf0.1 corpus. The lead() window shuffles
    the token stream by doc_id once; everything stays codegen."""
    t = documents.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "tk")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tk")] + [F.lead("tk", j).over(w) for j in range(1, n)]
    return (
        t.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("tk", n - 1).over(w).alias("_full"),
        )
        .filter(F.col("_full").isNotNull())
        .select("doc_id", "shingle")
    )


def doc_shingles(documents: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, shingle) distinct."""
    return shingle_stream(documents, n).distinct()


MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = NGRAM_N,
    min_jaccard: float = 0.2,
    max_shingle_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """(a, b, jaccard) for candidate pairs sharing >=1 shingle.

    Scale: the shingle self-join is partitioned by shingle; hot
    shingles are the skew risk — a stopword phrase appearing in d docs
    contributes d^2 join rows, which at CC scale is the whole job.
    Shingles with df > ``max_shingle_df`` are dropped BEFORE the
    self-join (broadcast anti-join on the small hot-shingle set): they
    carry no dedup signal, only quadratic cost. Jaccard denominators
    still count ALL shingles, so scores for pairs that shared a hot
    shingle are (slightly) underestimated, never inflated.
    """
    # one shingle pass feeds four plan branches (self-join a/b +
    # sizes a/b); Catalyst does not reuse the exchange across them, so
    # persist the distinct shingle relation (the production-scale analog
    # is a materialized shingle segment table)
    sh = doc_shingles(documents, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


MINHASH_P = (1 << 61) - 1


def minhash_coeffs(n_sigs: int = MINHASH_SIGS) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i 30-bit so
    a*h stays under 2^62 — no bigint overflow in either engine)."""
    from splade_spark.functions.hashing import py_md5_int

    return [
        (py_md5_int(f"a{i}") >> 2 | 1, py_md5_int(f"b{i}")) for i in range(n_sigs)
    ]


def minhash_signatures(documents: DataFrame, n_sigs: int = MINHASH_SIGS) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): min over shingles of n universal
    hashes (a_i*md5(shingle)+b_i mod P) — ONE md5 per shingle, the
    16 signature functions are cheap linear mixes (16x less hashing
    than seeded-md5-per-signature; identical SQL twin).

    No shingle-distinct pre-pass: min over a multiset equals min over
    its set, so the dedup shuffle doc_shingles() pays is pure waste
    here — this path goes shingle stream -> single groupBy(doc_id)."""
    sh = shingle_stream(documents).withColumn("h", md5_int(F.col("shingle")))
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MINHASH_P))
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_sigs))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    n_sigs: int = MINHASH_SIGS,
    n_bands: int = MINHASH_BANDS,
    min_est: float = 0.5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(a, b, est_jaccard): pairs sharing >=1 LSH band; est = fraction
    of agreeing minhash components.

    Scale: band join is an equi-join on (band_idx, band_key) — a
    candidate doc pair appears once per agreeing band, deduped by the
    groupBy. No O(n^2) stage over the CORPUS — but a single band
    bucket of B docs still emits O(B^2) pairs, and web corpora carry
    exact-duplicate boilerplate clusters that land whole in one bucket
    (measured: 1M docs in 1000-identical clusters -> 499.5M pairs).
    ``bucket_cap`` drops band buckets larger than the cap (the
    hot-shingle-df analog in ngram_jaccard_pairs): an over-cap bucket
    is near-certainly an exact-dup cluster, which exact_dedup — one
    md5 groupBy, run FIRST in the pipeline — removes for O(B) instead.
    Default None preserves the exhaustive contract (the oracle twin).
    """
    rows_per_band = n_sigs // n_bands
    sigs = minhash_signatures(documents, n_sigs)
    sig_arr = F.array(*[F.col(f"sig_{i}") for i in range(n_sigs)])
    bands = sigs.select(
        "doc_id",
        sig_arr.alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"sig_{bi * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_key").persist()
    # ^ both join sides read the banded relation; persist avoids
    # recomputing shingle->minhash for each side
    if bucket_cap is not None:
        over = (
            bands.groupBy("band_idx", "band_key")
            .count()
            .filter(F.col("count") > bucket_cap)
            .select("band_idx", "band_key")
        )
        # broadcast anti-join: over-cap buckets are few by construction
        bands = bands.join(F.broadcast(over), ["band_idx", "band_key"], "left_anti")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(MINHASH_SIGS if n_sigs is None else n_sigs)),
        6,
    )
    return cand.select("a", "b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= min_est
    )


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): tf-weighted sign-sum over token md5 bits."""
    dterms = (
        documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", md5_int(F.col("term")))
    )
    bit_sums = dterms.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("tf")
                * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 6,
    bits: int = SIMHASH_BITS,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs within Hamming distance.

    Scale: block on simhash prefix bytes (pigeonhole: two docs within
    hamming h share at least one of h+1 equal-width chunks) — here
    4 chunks of 8 bits for h<=3·, generalized to ceil(bits/(h+1)).
    ``bucket_cap`` drops chunk buckets larger than the cap — identical
    boilerplate clusters share EVERY chunk, so each contributes B^2
    join rows per chunk uncapped; same contract and rationale as
    minhash_lsh_pairs(bucket_cap=...). Default None = exhaustive.
    """
    n_chunks = max_hamming + 1
    chunk_w = bits // n_chunks
    sims = simhash(documents, bits)
    chunks = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("simhash"), c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_idx", "ch.chunk_val").persist()
    if bucket_cap is not None:
        over = (
            chunks.groupBy("chunk_idx", "chunk_val")
            .count()
            .filter(F.col("count") > bucket_cap)
            .select("chunk_idx", "chunk_val")
        )
        chunks = chunks.join(
            F.broadcast(over), ["chunk_idx", "chunk_val"], "left_anti"
        )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["a", "b"])
        .filter(F.col("hamming") <= max_hamming)
    )
