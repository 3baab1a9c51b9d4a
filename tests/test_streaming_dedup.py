"""Stateful streaming dedup: duplicates arriving in LATER micro-batches
must be suppressed by state carried across batches."""

from __future__ import annotations

import os

from splade_spark.streaming.dedup_state import stream_exact_dedup


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # batch 1: three docs, one internal duplicate pair (0, 2)
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(in_dir + "/f1")
    # batch 2: one true new doc + one duplicate of batch 1's text
    spark.createDataFrame(
        [(3, "epsilon zeta"), (4, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(in_dir + "/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    out = stream_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.text_hash, r.doc_id)
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # exactly one row per distinct text; duplicates (2, 4) suppressed
    assert len(rows) == 3
    assert {d for _, d in rows} == {0, 1, 3}
