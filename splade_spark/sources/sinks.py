"""Run sinks — the reference's output formats.

- run.json ``{qid: {doc: score}}`` (task/evaluator.py:256-258)
- TREC 6-column ``qid Q0 doc rank score runid``
  (pisa_inference/denseEvaluation.py:81-90)
Both are derived from the run DataFrame with built-in functions and
written distributed (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_json_df(run: DataFrame) -> DataFrame:
    """(qid, run_json) — one JSON score-map per query.

    Entries are formatted with %.6f (scores are already 6-dp rounded)
    and sorted lexicographically, so the byte output is deterministic
    across engines (the DuckDB twin renders identically)."""
    entry = F.format_string('"%s":%.6f', F.col("doc_id").cast("string"), F.col("score"))
    return (
        run.groupBy("qid")
        .agg(F.sort_array(F.collect_list(entry)).alias("entries"))
        .select(
            "qid",
            F.concat(F.lit("{"), F.array_join("entries", ","), F.lit("}")).alias(
                "run_json"
            ),
        )
    )


def write_run_json(run: DataFrame, path: str) -> None:
    run_json_df(run).write.mode("overwrite").json(path)


def trec_lines_df(run: DataFrame, runid: str = "splade_spark") -> DataFrame:
    """(qid, rank, line) TREC-format lines; %.6f score so the byte
    output is deterministic across engines."""
    return run.select(
        "qid",
        "rank",
        F.format_string(
            "%d Q0 %s %d %.6f %s",
            F.col("qid"),
            F.col("doc_id").cast("string"),
            F.col("rank"),
            F.col("score"),
            F.lit(runid),
        ).alias("line"),
    )


def vector_export_df(
    documents: DataFrame, postings: DataFrame, scale: int = 100
) -> DataFrame:
    """(doc_id, content, vector_json): the reference's quantized JSONL
    export row ``{"id", "content", "vector": {term: int}}``
    (pisa_inference/inference_SPLADE.py:70-72; quantize int(w*scale)
    clip [0,255], threshold > 0 per index2pisa.py:42-48). int() is
    TRUNCATION, so the export uses floor — distinct from the in-index
    quant_bytes convention (codec.quantize rint, the bmp_inference
    rounding) — each matches its own reference sink byte-for-byte.
    Entries are '"term":impact' strings sorted lexicographically so
    the JSON bytes are deterministic across engines."""
    q = F.least(F.floor(F.col("impact") * scale), F.lit(255)).cast("int")
    entries = (
        postings.select("doc_id", "term", q.alias("iq"))
        .filter(F.col("iq") > 0)
        .select("doc_id", F.format_string('"%s":%d', "term", "iq").alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("e")).alias("es"))
        .select(
            "doc_id",
            F.concat(F.lit("{"), F.array_join("es", ","), F.lit("}")).alias(
                "vector_json"
            ),
        )
    )
    return documents.select("doc_id", F.col("text").alias("content")).join(
        entries, "doc_id"
    )


def write_vectors_jsonl_gz(vectors: DataFrame, path: str) -> None:
    """Gzip JSONL export (reference sink: one JSON object per doc,
    inference_SPLADE.py:43,71-72) — codec handled by the writer,
    distributed, no driver collect."""
    vectors.write.mode("overwrite").option("compression", "gzip").json(path)


def remap_run_urls(run: DataFrame, docs_dim: DataFrame) -> DataFrame:
    """(qid, url, score, rank): internal docid -> external id
    (reference analog: ``self.doc_ids[id_]`` remap,
    task/evaluator.py:242-243).

    The SMALL side of this join is the run (<= k rows per query); the
    docs dimension is O(corpus) and must never be broadcast. Hint the
    run side: Spark builds the hash table from the run and streams the
    dim scan — at 10^12 docs that is the only shape that survives."""
    return docs_dim.select("doc_id", "url").join(
        F.broadcast(run), "doc_id"
    ).select("qid", "url", "score", "rank")


def write_trec_run(run: DataFrame, path: str, runid: str = "splade_spark") -> None:
    trec_lines_df(run, runid).select("line").write.mode("overwrite").text(path)
