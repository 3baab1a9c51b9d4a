"""North-rule invariant: extracted text per url is byte-identical to
the source column (input_hint; the reference consumes pre-extracted
text, indexing.py:7-13, so extraction must be the identity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from splade_spark.sources.pages import (
    documents_to_pages,
    extract_text,
    load_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_extracted_text_byte_identical(spark):
    docs = load_documents(spark, SF_DIR)
    pages = documents_to_pages(docs)
    extracted = extract_text(pages).select(
        "url", F.encode("text", "UTF-8").alias("ext_bytes")
    )
    source = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.encode("text", "UTF-8").alias("src_bytes"),
    )
    diff = (
        extracted.join(source, "url", "full")
        .filter(
            F.col("ext_bytes").isNull()
            | F.col("src_bytes").isNull()
            | (F.col("ext_bytes") != F.col("src_bytes"))
        )
        .count()
    )
    assert diff == 0


def test_pages_schema_matches_input_hint(spark):
    pages = documents_to_pages(load_documents(spark, SF_DIR))
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
