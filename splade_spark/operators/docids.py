"""Quality-ordered docID reassignment — the ingest-side layout step
that makes Block-Max pruning's byte savings physically real.

BENCH/BASELINE.md measures the mechanism: with doc-RANGE salting,
pruned postings scans skip parquet row groups only when high-
block-max blocks CLUSTER in docID space. A corpus whose doc ids are
assigned in quality/length order (the web-IR docID-reassignment
technique; crawl/site locality approximates it) keeps 3x fewer
blocks and reads ~6% of the exhaustive bytes, vs ~85% when hot
blocks scatter. The reference inherits ingestion order (docids are
CollectionDataset insertion order, indexing.py:29-41) and never
reassigns; this operator makes the layout choice explicit.

Scale-safe dense enumeration: a global `row_number()` window has no
partition key, so Catalyst collapses it to ONE task. Instead:
range-repartition on the sort key (Spark's distributed sort), count
rows per partition (metadata-scale), broadcast the cumulative
offsets, and number within partitions — the same pattern the term
dictionary uses for dense term ids (index_build.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reassign_doc_ids(
    docs: DataFrame,
    order_by: list[Column] | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Dense new doc ids 0..N-1 in ``order_by`` order (default: text
    length ascending, original doc_id as the deterministic tie-break —
    shortest/highest-impact docs first, matching the clustered layout
    the prune bench measures). Returns the input columns plus
    ``new_doc_id``; downstream indexing uses
    ``select(col("new_doc_id").alias("doc_id"), "text")`` and keeps
    the (new_doc_id, doc_id) projection as the remap dimension."""
    spark = docs.sparkSession
    order = order_by or [F.length("text").asc(), F.col("doc_id").asc()]
    n = n_parts or spark.sparkContext.defaultParallelism * 2
    ranged = docs.repartitionByRange(n, *order).sortWithinPartitions(*order)
    # persist pins the range boundaries: repartitionByRange SAMPLES its
    # input per job, so without it the count job and the numbering job
    # could run with different partition boundaries and the offsets
    # would number the wrong rows. One materialized pass either way.
    part = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    # per-partition counts -> cumulative offsets: n_parts rows, driver-
    # safe at any corpus size (metadata, not data)
    counts = part.groupBy("_pid").count().collect()
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["count"])
    off_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    return (
        part.join(off_df, "_pid")
        .withColumn(
            "new_doc_id", (F.col("_off") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid", "_off")
    )
