"""PISA binary interchange sink: byte-identity against an independent
single-process re-implementation of the reference's export algorithm
(index2pisa.py:26-74 semantics: scan exported JSONL rows in doc order,
first-appearance term enumeration, uint32-LE length-prefixed
sequences), plus a structural round-trip via read_pisa_index.
"""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from splade_spark.engine import logical_postings
from splade_spark.sources.sinks import (
    read_pisa_index,
    vector_export_df,
    write_pisa_index,
)

DOCS = [
    (0, "sparse retrieval with inverted lists"),
    (1, "dense retrieval with vectors"),
    (2, "sparse sparse sparse lists"),
    (3, "inverted index construction"),
    (4, "a document about nothing relevant"),
    (5, "lists of lists of lists"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").persist()


def _reference_style_export(jsonl_rows, out_prefix, threshold=0):
    """Independent re-implementation of the reference export contract:
    consume {'id', 'vector'} rows in doc order, accumulate postings in
    first-appearance order, emit the four files."""
    posting: dict[str, list] = {}
    lengths = []
    for idx, row in enumerate(jsonl_rows):
        vector = row["vector"]
        n = 0
        for term, score in vector.items():
            if int(score) > threshold:
                n += 1
                posting.setdefault(term, []).append((idx, int(score)))
        lengths.append(n)

    def seq(vals):
        return struct.pack("<I", len(vals)) + b"".join(
            struct.pack("<I", v) for v in vals
        )

    with open(out_prefix + ".docs", "wb") as fd, open(
        out_prefix + ".freqs", "wb"
    ) as ff:
        fd.write(seq([len(lengths)]))
        for term in posting:
            fd.write(seq([p[0] for p in posting[term]]))
            ff.write(seq([p[1] for p in posting[term]]))
    with open(out_prefix + ".sizes", "wb") as fs:
        fs.write(seq(lengths))
    with open(out_prefix + ".id", "w") as fi:
        json.dump({t: i for i, t in enumerate(posting)}, fi)


def test_pisa_byte_identity(spark, corpus, tmp_path):
    post = logical_postings(corpus)
    # the exported-JSONL view of the corpus, in doc order with
    # lexicographic vector keys — exactly what the reference scans
    rows = [
        {"id": r.doc_id, "vector": json.loads(r.vector_json)}
        for r in vector_export_df(corpus, post)
        .orderBy("doc_id")
        .collect()
    ]
    ref_prefix = str(tmp_path / "ref")
    _reference_style_export(rows, ref_prefix)

    spark_prefix = str(tmp_path / "spark")
    stats = write_pisa_index(corpus, post, spark_prefix)
    assert stats["n_docs"] == len(DOCS)

    for ext in (".docs", ".freqs", ".sizes"):
        a = open(spark_prefix + ext, "rb").read()
        b = open(ref_prefix + ext, "rb").read()
        assert a == b, f"{ext} differs"
    assert json.load(open(spark_prefix + ".id")) == json.load(
        open(ref_prefix + ".id")
    )


def test_pisa_round_trip(spark, corpus, tmp_path):
    post = logical_postings(corpus)
    prefix = str(tmp_path / "rt")
    stats = write_pisa_index(corpus, post, prefix)
    back = read_pisa_index(prefix)
    assert back["n_docs"] == stats["n_docs"]
    assert sum(back["sizes"]) == stats["n_postings"]

    # postings parsed back == the quantized relation
    dq = (
        post.select(
            "doc_id",
            "term",
            F.least(F.floor(F.col("impact") * 100), F.lit(255))
            .cast("int")
            .alias("iq"),
        )
        .filter(F.col("iq") > 0)
        .collect()
    )
    expect = {}
    for r in sorted(dq, key=lambda r: (r.term, r.doc_id)):
        expect.setdefault(r.term, []).append((r.doc_id, r.iq))
    # doc_ids are already 0..N-1 in this fixture, so idx == doc_id
    assert back["postings"] == expect
