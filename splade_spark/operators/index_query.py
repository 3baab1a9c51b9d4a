"""Query execution against the materialized compressed index.

Reference lifecycle (task/evaluator.py:186-243): load HDF5 index into
dicts, per query traverse posting lists with the numba kernel, top-k.
Spark plan here:

1. query terms -> term_ids via broadcast join with term_dict
   (vocabulary filter, queries2pisa.py:34-49, falls out of the join);
2. postings scan pruned two ways: a literal ``bucket IN (...)``
   filter (parquet partition-directory pruning — the Iceberg
   bucket(term_id) analog) + broadcast semi-join on term_id;
3. Arrow-batched block decode (mapInPandas) producing the partial
   products q_tf * impact — the decode stays columnar numpy;
4. hash-aggregate sum per (qid, doc_id), threshold filter, window
   top-k with the pinned (-score, doc_id) tie rule.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_spark import SCORE_THRESHOLD, TOPK_DEFAULT
from splade_spark.functions.codec import decode_block
from splade_spark.operators.retrieval import query_terms, topk_window


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def load_term_dict(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "term_dict"))


def load_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "postings"))


def _decode_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        qids, docs, partials = [], [], []
        for row in pdf.itertuples(index=False):
            doc_ids, impacts = decode_block(
                row.first_doc_id, row.n, row.doc_gap_bytes, row.impact_bytes
            )
            qids.append(np.full(row.n, row.qid, dtype=np.int64))
            docs.append(doc_ids)
            partials.append(row.q_tf * impacts)
        yield pd.DataFrame(
            {
                "qid": np.concatenate(qids),
                "doc_id": np.concatenate(docs),
                "partial": np.concatenate(partials),
            }
        )


def search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOPK_DEFAULT,
    threshold: float = SCORE_THRESHOLD,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(qid, doc_id, score, rank) from the compressed index."""
    term_dict = load_term_dict(spark, index_dir)
    qt = (
        query_terms(queries)
        .join(term_dict.select("term", "term_id"), "term")
        .select("qid", "term_id", "q_tf")
    )
    if postings is None:
        postings = load_postings(spark, index_dir)
    # literal bucket list -> parquet partition pruning (query side is
    # tiny; collecting it is the reference's own query-loading shape)
    n_buckets = postings.select(F.max("bucket")).first()[0]
    buckets = sorted(
        {int(r.term_id) % (n_buckets + 1) for r in qt.select("term_id").distinct().collect()}
    )
    pruned = postings.filter(F.col("bucket").isin(buckets)).join(
        F.broadcast(qt), "term_id"
    )
    partials = pruned.select(
        "qid", "q_tf", "first_doc_id", "n", "doc_gap_bytes", "impact_bytes"
    ).mapInPandas(_decode_partials, schema="qid long, doc_id long, partial double")
    scored = (
        partials.groupBy("qid", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .filter(F.col("score") > F.lit(threshold))
    )
    return topk_window(scored, k)
