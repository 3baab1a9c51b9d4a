"""Corpus sources.

The reference loads its corpus from TSV into a dict
(indexing.py:7-13, data/data.py:55-62). Our canonical source is an
Iceberg-shaped ``pages`` table (url, warc_ts, html, text, lang) per
BASELINE.json input_hint. In the sandbox we derive it
deterministically from the driver's ``documents.parquet``
(FIXTURES.md §1): ``url = 'doc://' || doc_id``, ``html`` wraps the
text, extraction is the identity on ``text`` so extracted text stays
byte-identical per url.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def documents_to_pages(documents: DataFrame) -> DataFrame:
    """Map the driver's documents table onto the input_hint pages shape.

    Deterministic: url is a pure function of doc_id; warc_ts a pure
    function of doc_id; html wraps text (provenance only — the
    reference consumes pre-extracted text, indexing.py:7-13, so our
    extraction is identity on ``text``).
    """
    return documents.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def load_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_to_pages(load_documents(spark, sf_dir))


def extract_text(pages: DataFrame) -> DataFrame:
    """Identity extraction (byte-identical per url — the north-rule
    invariant; the reference never parses HTML, SURVEY.md §1.1)."""
    return pages.select("url", "text", "lang")


def extract_text_from_html(pages: DataFrame) -> DataFrame:
    """(url, extracted): re-derive the text from the html payload by
    stripping the deterministic wrapper tags. For the synthetic pages
    table this must be BYTE-IDENTICAL to the stored ``text`` column —
    the north-rule invariant, oracle-checked (entry pages_extract) and
    asserted in tests. A production extractor slots in here as a
    pandas UDF; the wrapper-strip is a JVM regexp (no Python)."""
    return pages.select(
        "url",
        F.regexp_replace(
            F.decode(F.col("html"), "UTF-8"), "^<html><body>|</body></html>$", ""
        ).alias("extracted"),
    )


def compose_doc_text(documents: DataFrame, title_col: str = "source") -> DataFrame:
    """Doc-text composition parity: ``"title: {t} | context: {x}"``
    (reference get_doc_text, indexing.py:23-27)."""
    return documents.select(
        "doc_id",
        F.concat(
            F.lit("title: "), F.col(title_col), F.lit(" | context: "), F.col("text")
        ).alias("composed"),
    )


def compose_doc_text_beir(
    documents: DataFrame, title_col: str = "source"
) -> DataFrame:
    """BeIR composition variant: ``"{title} {text}"``
    (bmp_inference/inference_all_beir_doc_bmp.py:69)."""
    return documents.select(
        "doc_id",
        F.concat(F.col(title_col), F.lit(" "), F.col("text")).alias("composed"),
    )


def read_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """TSV parity with read_msmarco_corpus (indexing.py:7-13):
    ``pid \t text`` lines -> (url, text)."""
    df = (
        spark.read.option("sep", "\t")
        .schema("pid STRING, text STRING")
        .csv(path)
    )
    return df.select(
        F.concat(F.lit("doc://"), F.col("pid")).alias("url"), F.col("text")
    )


def read_tsv_queries(spark: SparkSession, path: str) -> DataFrame:
    """TSV parity with read_msmarco_query (evaluate.py:80-86)."""
    return (
        spark.read.option("sep", "\t")
        .schema("qid LONG, text STRING")
        .csv(path)
    )
