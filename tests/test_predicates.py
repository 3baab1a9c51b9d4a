"""in_literals / block_pairs_expr must be row-identical to the
Column-ops predicates they replaced (Column.isin chains), including
pushdown-visibility: both compile to plain In/EqualTo trees Catalyst
can push to parquet. The replacement exists because Column.isin costs
one py4j round trip PER literal (2.4s of serial driver time for a
4096-term batch predicate — see index_query.in_literals docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from splade_spark.operators.index_query import block_pairs_expr, in_literals


def test_in_literals_matches_isin(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).cast("int").alias("term_id"),
        (F.col("id") % 13).cast("int").alias("block_id"),
    )
    vals = [3, 11, 42, 96]
    a = df.filter(in_literals("term_id", vals)).collect()
    b = df.filter(F.col("term_id").isin(vals)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0


def test_in_literals_empty_is_false(spark):
    df = spark.range(10).select(F.col("id").cast("int").alias("term_id"))
    assert df.filter(in_literals("term_id", [])).count() == 0


def test_block_pairs_expr_matches_column_ops(spark):
    df = spark.range(2000).select(
        (F.col("id") % 37).cast("int").alias("term_id"),
        (F.col("id") % 29).cast("int").alias("block_id"),
    )
    by_t = {5: [1, 7, 28], 11: [0], 36: [2, 3]}
    expr = None
    for t, bs in by_t.items():
        e = (F.col("term_id") == t) & F.col("block_id").isin(bs)
        expr = e if expr is None else expr | e
    a = df.filter(block_pairs_expr(by_t)).collect()
    b = df.filter(expr).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0
    assert df.filter(block_pairs_expr({})).count() == 0
