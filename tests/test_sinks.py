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
