"""splade_spark — a from-scratch PySpark-native sparse-retrieval engine.

Re-expresses the capabilities of the ViViVidam/splade reference
(index-then-retrieve pipeline: sparse term->impact vectors, inverted
posting lists, BM25 top-k with block-max pruning, ranked-run
evaluation) as idiomatic Spark DataFrame programs, designed for a
10^12-document Common-Crawl-style corpus.

Layout
------
- ``sources/``   : pages/queries/qrels readers, testdata adapters,
                   snapshot-committed table storage (Iceberg-gated,
                   parquet+manifest fallback in the sandbox).
- ``functions/`` : tokenizer, BM25 weighting, posting-block codec
                   (delta-gap VByte + quantized impacts), text
                   analysis, minhash/simhash, vector math.
- ``operators/`` : index build (salted groupBy -> encoded blocks),
                   segment merge, query-time top-k with MaxScore /
                   block-max pruning, dedup family, ANN, metrics.
- ``plans/``     : lineage/checkpoint bookkeeping for the resumable
                   index-build DAG.
- ``streaming/`` : incremental index segments via Structured
                   Streaming (availableNow + foreachBatch).

Reference citations in docstrings are file:line into /root/reference.
"""

__version__ = "0.1.0"

K1 = 0.9
B = 0.4
TOKEN_SPLIT_RE = "[^a-z0-9]+"
DOC_SCALE = 100  # reference pisa_inference/inference_SPLADE.py:19
QUERY_SCALE = 50  # reference pisa_inference/inference_q_SPLADE.py:13
TOPK_DEFAULT = 1000  # reference evaluate.py:164
SCORE_THRESHOLD = 0.0  # reference task/evaluator.py:213
