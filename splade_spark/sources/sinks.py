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
    """(qid, run_json) — one JSON score-map per query."""
    return (
        run.groupBy("qid")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("doc_id").cast("string"), "score"))
                )
            ).alias("scores")
        )
        .select("qid", F.to_json("scores").alias("run_json"))
    )


def write_run_json(run: DataFrame, path: str) -> None:
    run_json_df(run).write.mode("overwrite").json(path)


def trec_lines_df(run: DataFrame, runid: str = "splade_spark") -> DataFrame:
    """(qid, rank, line) TREC-format lines."""
    return run.select(
        "qid",
        "rank",
        F.concat_ws(
            " ",
            F.col("qid").cast("string"),
            F.lit("Q0"),
            F.col("doc_id").cast("string"),
            F.col("rank").cast("string"),
            F.col("score").cast("string"),
            F.lit(runid),
        ).alias("line"),
    )


def write_trec_run(run: DataFrame, path: str, runid: str = "splade_spark") -> None:
    trec_lines_df(run, runid).select("line").write.mode("overwrite").text(path)
