from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from splade_spark.functions.tokenize import (
    encode_sparse,
    py_tokenize,
    tokens_col,
)

CASES = [
    "The quick brown FOX, jumps; over_the lazy dog!!",
    "",
    "   ",
    "a",
    "123 abc a1b2 ---",
    "Ünïcode stays out café naïve",
    "tab\tsep\nnewline",
]


def test_jvm_tokenizer_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    got = [r[0] for r in df.select(tokens_col("text")).collect()]
    want = [py_tokenize(t) for t in CASES]
    assert got == want


def test_encode_sparse_matches_counter(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    got = [r[0] for r in df.select(encode_sparse("text")).collect()]
    want = [dict(Counter(py_tokenize(t))) for t in CASES]
    assert got == want


def test_empty_doc_has_zero_len(spark):
    df = spark.createDataFrame([("",), ("one two",)], "text string")
    lens = [
        r[0] for r in df.select(F.size(tokens_col("text"))).collect()
    ]
    assert lens == [0, 2]
