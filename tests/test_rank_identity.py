"""North-rule check: the Spark engine's BM25 top-k is rank-identical
to (a) the single-node numpy oracle that replicates the reference
scorer (task/evaluator.py:152-180) and (b) the DuckDB ANSI-SQL twin.
"""

from __future__ import annotations

import pytest

from splade_spark.engine import bm25_run
from splade_spark.oracle import OracleIndex
from splade_spark.sources.pages import load_documents
from splade_spark.sql_oracle import bm25_topk_sql
from splade_spark.synth import derive_queries

from tests.conftest import SF_SMOKE

K = 10


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return load_documents(spark, SF_SMOKE).toPandas()


@pytest.fixture(scope="module")
def spark_run(spark):
    run = bm25_run(load_documents(spark, SF_SMOKE), k=K)
    pdf = run.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    return pdf


def test_rank_identity_vs_numpy_oracle(spark, docs_pdf, spark_run):
    idx = OracleIndex(dict(zip(docs_pdf.doc_id, docs_pdf.text)))
    queries = {
        int(r.qid): r.text
        for r in derive_queries(
            spark.createDataFrame(docs_pdf)
        ).collect()
    }
    assert len(queries) > 0
    got = {
        qid: list(zip(g.doc_id, g.score))
        for qid, g in spark_run.groupby("qid")
    }
    assert set(got) <= set(queries)
    for qid, text in queries.items():
        want = OracleIndex.score_query(idx, text, K)
        have = [(int(d), float(s)) for d, s in got.get(qid, [])]
        assert have == [(d, pytest.approx(s, abs=1e-9)) for d, s in want], (
            f"qid={qid}"
        )


def test_rank_identity_vs_duckdb(duck_smoke, spark_run):
    odf = (
        duck_smoke.sql(bm25_topk_sql(K))
        .df()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert len(odf) == len(spark_run)
    assert (odf.qid.values == spark_run.qid.values).all()
    assert (odf.doc_id.values == spark_run.doc_id.values).all()
    assert (odf["rank"].values == spark_run["rank"].values).all()
    assert (abs(odf.score.values - spark_run.score.values) < 1e-12).all()


def test_oov_query_returns_empty(spark, docs_pdf):
    qdf = spark.createDataFrame(
        [(999999, "zzzzqqqq xxxyyyzzz")], "qid long, text string"
    )
    run = bm25_run(spark.createDataFrame(docs_pdf), queries=qdf, k=K)
    assert run.count() == 0
