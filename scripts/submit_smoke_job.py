"""spark-submit entry: build a tiny index from the sf0.001 fixture and
run one pruned query — proves the --py-files packaging serves the whole
engine (build -> search -> sink) without a repo checkout on the
executors' path."""
import json
import sys
import tempfile

from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("splade-submit-smoke").getOrCreate()

from splade_spark.operators.index_build import build_index
from splade_spark.operators.maxscore import search_maxscore_fused
from splade_spark.sources.pages import load_documents
from splade_spark.synth import derive_queries

docs = load_documents(spark, "/root/testdata/sf0.001")
idx = tempfile.mkdtemp(prefix="submit_idx_")
build_index(docs.select("doc_id", "text"), idx, n_segments=2, n_buckets=8)
qrows = [
    (int(r.qid), r.text)
    for r in derive_queries(docs).orderBy("qid").limit(3).collect()
]
run = search_maxscore_fused(spark, idx, qrows, k=10)
n = run.count()
print("SMOKE_RESULT " + json.dumps({"queries": len(qrows), "run_rows": n}))
spark.stop()
sys.exit(0 if n > 0 else 1)
