"""Table schemas (StructTypes) for every engine table.

The reference has no schema system (dynamic dicts / TSV splits,
SURVEY.md §1); ours pins fixed StructTypes per BASELINE.json
input_hint and FIXTURES.md §4.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input corpus — exactly BASELINE.json input_hint.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Reference query set shape: qid -> text (evaluate.py:80-86).
QUERIES = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# Relevance judgments (generate_datasets.py:30-36; binary rel).
QRELS = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("rel", T.IntegerType(), False),
    ]
)

# DocID dimension — reference doc_ids.pkl + .sizes
# (task/evaluator.py:128, pisa_inference/index2pisa.py:72-74).
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
)

# Term dictionary — reference .id map + index_dist.json
# (index2pisa.py:53-59, indexing/inverted_index.py:90-94).
TERM_DICT = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("max_impact", T.DoubleType(), False),
    ]
)

# Compressed posting blocks — reference index_doc_id_{k}/index_doc_value_{k}
# HDF5 datasets (inverted_index.py:81-89) and PISA .docs/.freqs
# (index2pisa.py:62-71), with the Block-Max metadata made explicit.
POSTINGS = T.StructType(
    [
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        # long: block_id = salt * 2^24 + seq (index_build._BLOCK_ID_STRIDE),
        # and salt counts scale with per-term df / salt_unit — an int32
        # caps a posting list at 128 salt units (~8.4M postings), which a
        # 10^12-doc stopword exceeds by orders of magnitude (measured: the
        # 16M-doc replicated corpus already overflows the Arrow cast)
        T.StructField("block_id", T.LongType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("doc_gap_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("impact_bytes", T.BinaryType(), False),  # float64 BM25 impacts
        T.StructField("quant_bytes", T.BinaryType(), False),  # uint8 quantized impacts
        T.StructField("block_max", T.DoubleType(), False),
    ]
)

# Ranked run — reference run.json {qid:{did:score}} (task/evaluator.py:242-258).
RUN = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

# Per-partition lineage/metrics (north rule resumability).
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
    ]
)
