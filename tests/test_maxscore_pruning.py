"""MaxScore/Block-Max pruning must actually FIRE on a skewed corpus.

The round-1 bench corpus replicated docs, equalizing block maxima, so
blocks_kept/blocks_total stayed ~1.0 and the pruning path was only
lossless-tested, never shown effective. This fixture builds the skew
pruning exploits: document length grows with doc_id, the rare query
term appears only in the shortest docs, so the common term's
high-doc_id blocks have low block maxima and prune against the
champion floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.operators.index_build import build_index
from splade_spark.operators.index_query import search
from splade_spark.operators.maxscore import search_maxscore

N_DOCS = 20_000
N_RARE = 40


def _skewed_docs(spark):
    # doc i: ["rare"] (i < N_RARE) + "common" (half the docs, so its
    # idf is ~ln2, not ~0) + "pad" * (3 + i // 8) for dl skew. The
    # rare docs are the SHORTEST, so their common-term impacts are the
    # highest — the champion floor theta exceeds ub_rare and the
    # common term's long-doc (low block-max) blocks prune away.
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") < N_RARE, F.lit("rare ")).otherwise(F.lit("")),
            F.when(
                (F.col("id") < N_RARE) | (F.col("id") % 2 == 0), F.lit("common")
            ).otherwise(F.lit("filler")),
            F.repeat(F.lit(" pad"), (F.lit(3) + (F.col("id") / 8).cast("int"))),
        ).alias("text"),
    )


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("skewed_idx"))
    build_index(_skewed_docs(spark), idx, n_segments=2)
    return idx


def test_pruning_fires_and_stays_lossless(spark, skewed_index):
    queries = spark.createDataFrame([(1, "rare common")], "qid long, text string")
    counts: dict = {}
    pruned = search_maxscore(
        spark, skewed_index, queries, k=10, debug_counts=counts
    ).collect()
    assert counts["blocks_total"] > 50, counts
    kept_frac = counts["blocks_kept"] / counts["blocks_total"]
    assert kept_frac < 0.5, counts

    exhaustive = search(spark, skewed_index, queries, k=10).collect()
    assert [(r.qid, r.doc_id, r.rank) for r in sorted(pruned, key=lambda r: r.rank)] == [
        (r.qid, r.doc_id, r.rank) for r in sorted(exhaustive, key=lambda r: r.rank)
    ]
    # scores exact, not just ranks
    assert {(r.doc_id, r.score) for r in pruned} == {
        (r.doc_id, r.score) for r in exhaustive
    }


def test_fused_maxscore_matches_and_prunes(spark, skewed_index):
    from splade_spark.operators.maxscore import search_maxscore_fused

    queries = spark.createDataFrame([(1, "rare common")], "qid long, text string")
    exhaustive = search(spark, skewed_index, queries, k=10).collect()
    # driver fast path (default) AND the distributed pruned-scan branch
    # (forced with driver_block_limit=0) must both match exactly
    for limit in (256, 0):
        counts: dict = {}
        fused = search_maxscore_fused(
            spark,
            skewed_index,
            [(1, "rare common")],
            k=10,
            debug_counts=counts,
            driver_block_limit=limit,
        ).collect()
        assert counts["blocks_kept"] / counts["blocks_total"] < 0.5, counts
        assert {(r.doc_id, r.score, r.rank) for r in fused} == {
            (r.doc_id, r.score, r.rank) for r in exhaustive
        }, limit
