from __future__ import annotations

import json

from splade_spark.engine import bm25_run
from splade_spark.sources.pages import load_documents
from splade_spark.sources.sinks import run_json_df, trec_lines_df

from tests.conftest import SF_SMOKE


def test_trec_lines_format(spark):
    run = bm25_run(load_documents(spark, SF_SMOKE), k=3)
    lines = trec_lines_df(run, runid="testrun").collect()
    assert len(lines) == run.count()
    parts = lines[0].line.split(" ")
    assert len(parts) == 6
    assert parts[1] == "Q0" and parts[5] == "testrun"
    assert int(parts[3]) in (1, 2, 3)


def test_run_json_is_score_map(spark):
    run = bm25_run(load_documents(spark, SF_SMOKE), k=3)
    row = run_json_df(run).first()
    m = json.loads(row.run_json)
    assert 1 <= len(m) <= 3
    assert all(isinstance(v, float) for v in m.values())


def test_vector_export_jsonl_gz_roundtrip(spark, tmp_path):
    import glob
    import json

    from splade_spark.engine import logical_postings
    from splade_spark.sources.pages import load_documents
    from splade_spark.sources.sinks import vector_export_df, write_vectors_jsonl_gz

    docs = load_documents(spark, "/root/testdata/sf0.001").limit(50)
    vecs = vector_export_df(docs, logical_postings(docs))
    out = str(tmp_path / "vecs")
    write_vectors_jsonl_gz(vecs, out)
    files = glob.glob(out + "/*.json.gz")
    assert files, "gzip part files written"
    back = spark.read.json(out)
    assert back.count() == vecs.count()
    row = back.limit(1).collect()[0]
    vec = json.loads(row.vector_json)  # valid JSON {term: int}
    assert vec and all(isinstance(v, int) and 0 < v <= 255 for v in vec.values())
