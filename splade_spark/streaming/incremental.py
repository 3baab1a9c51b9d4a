"""Incremental index segments via Structured Streaming.

The reference is strictly batch (SLURM array jobs,
pisa_inference/launch.sh:11-16); the north rule's resumable DAG is
met with snapshot commits. This module is the streaming extension:
``readStream`` over a pages/documents directory, ``foreachBatch``
running the SAME per-segment build as the batch path (one segment
per epoch, committed to the same manifest), ``availableNow`` trigger
so a scheduled run drains new files and stops. ``finalize_index``
then merges all segments exactly as in batch — so batch-built and
stream-built indexes are byte-compatible.

Also provides a windowed ingest-stats stream (watermark + tumbling
window over warc_ts) as the monitoring analog of the reference's
running stat prints (task/evaluator.py:112-113).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_spark.functions.tokenize import doc_terms, tokenize_docs
from splade_spark.plans.snapshots import Manifest, dir_bytes


def stream_build_segments(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain available input files into per-epoch segments; returns
    number of segments committed. Resumable two ways: Spark streaming
    checkpoint (offsets) + manifest snapshots (segment commits)."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
        .parquet(input_dir)
    )
    committed = {"n": 0}

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        man = Manifest.load(index_dir)
        key = f"stream-epoch={epoch_id}"
        if key in man.committed("segment"):
            return  # exactly-once vs foreachBatch replay
        t0 = time.time()
        seg_dir = os.path.join(index_dir, "segments", key)
        terms = doc_terms(batch_df).select("term", "doc_id", "tf", "dl")
        terms.write.mode("overwrite").parquet(os.path.join(seg_dir, "terms"))
        lens = tokenize_docs(batch_df).select("doc_id", "dl")
        lens.write.mode("overwrite").parquet(os.path.join(seg_dir, "docs"))
        man.commit(
            "segment",
            key,
            rows=batch_df.count(),
            bytes_=dir_bytes(seg_dir),
            wall_ms=int((time.time() - t0) * 1000),
            partition_id=int(epoch_id),
        )
        committed["n"] += 1

    q = (
        reader.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", os.path.join(index_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return committed["n"]


def stream_append(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int | None = None,
    min_drain_frac: float = 0.0,
) -> int:
    """One continuous-ingestion step: drain newly arrived files into
    stream-epoch segments, then bring the FINALIZED index up to date —
    the streaming twin of ``operators.index_build.append_index``.

    Global BM25 stats (N, avgdl, df) change with every ingested doc,
    so the finalize merge re-runs over ALL segments (committed layout
    params are reused from stats.json); the refreshed index equals a
    full rebuild over everything ingested so far. Returns the number
    of NEW segments drained (0 = nothing arrived and the index was
    already finalized — a no-op).

    ``min_drain_frac`` is the drain-economics knob (measured in
    BENCH/BASELINE.md: the re-finalize costs ~a rebuild regardless of
    drain size, because BM25 stats are global): when the serving index
    is complete and the PENDING docs (drained into committed segments
    but not yet covered by a finalize) are under ``min_drain_frac`` of
    the indexed corpus, the re-finalize is deferred — segments
    accumulate durably, queries keep serving the last snapshot, and a
    later call (or a ``min_drain_frac=0`` flush) folds the backlog in
    one finalize. Deferral never applies to an INCOMPLETE finalize —
    that is always repaired.

    Resumable at every point: the stream checkpoint makes file
    processing exactly-once, and segment commits skip on replay.
    Staleness is decided by COVERAGE, not by what this call drained:
    pending = (sum of committed segment rows) - (docs covered by
    stats.json), so a finalize that predates ANY committed segment —
    complete-but-stale after a deferral, or partial from a mid-drain
    crash — retracts and re-runs, while a partial finalize that
    already covers every segment resumes its remaining sub-steps.
    Doc-id disjointness across input files is the ingest contract.
    """
    import json

    from splade_spark.operators.index_build import finalize_index, invalidate_bmp

    n_new = stream_build_segments(
        spark, input_dir, index_dir, schema, max_files_per_trigger
    )
    man = Manifest.load(index_dir)
    finalize_done = man.committed("finalize")
    seg_rows = sum(
        max(int(s.get("rows", 0)), 0)
        for s in man.lineage_rows()
        if s["stage"] == "segment"
    )
    stats_path = os.path.join(index_dir, "stats.json")
    kwargs: dict = {}
    covered_rows = 0
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            prior = json.load(f)
        covered_rows = int(prior.get("n_docs", 0))
        from splade_spark.functions.codec import BLOCK_SIZE
        from splade_spark.operators.index_build import (
            DEFAULT_BUCKETS,
            DEFAULT_SALT_UNIT,
        )

        kwargs = {
            "n_buckets": int(prior.get("n_buckets", DEFAULT_BUCKETS)),
            "block_size": int(prior.get("block_size", BLOCK_SIZE)),
            "salt_unit": int(prior.get("salt_unit", DEFAULT_SALT_UNIT)),
            "gap_codec": prior.get("gap_codec", "vbyte"),
            "store_impacts": bool(prior.get("store_impacts", True)),
        }
    if seg_rows < covered_rows:
        # impossible under the ingest contract: a finalize covers
        # exactly the union of committed segments, so stats.n_docs can
        # never exceed the summed segment rows. Reaching here means
        # coverage accounting drifted — a segment commit missing its
        # ``rows`` field, or duplicate doc_ids across drained files
        # inflating a past finalize. Silently clamping would treat the
        # index as complete and leave genuinely-pending docs deferred
        # forever, so fail loudly instead.
        raise RuntimeError(
            "stream_append coverage drift: committed segment rows "
            f"({seg_rows}) < docs covered by the finalized index "
            f"({covered_rows}); check segment manifest 'rows' fields "
            "and the doc_id-disjointness of drained files"
        )
    pending_rows = max(seg_rows - covered_rows, 0)
    if "index" in finalize_done:
        if pending_rows == 0:
            return n_new  # serving index already covers every segment
        if pending_rows < min_drain_frac * max(covered_rows, 1):
            return n_new  # defer: backlog below the economics threshold
    if finalize_done and pending_rows > 0:
        # committed finalize sub-steps predate some committed segment
        # (stale-complete after a deferral, or partial from a mid-drain
        # crash): resuming would skip stats/term_dict computed without
        # those docs and silently drop them from the index. The derived
        # bmp tables go first — a crash between the two re-runs this
        # block (retract is recorded last); the next call re-retracts.
        invalidate_bmp(index_dir, man, reason=f"stream-append:{pending_rows}")
        man.retract("finalize", reason=f"stream-append:{pending_rows}")
    finalize_index(spark, index_dir, **kwargs)
    return n_new


def ingest_stats_stream(pages_stream: DataFrame) -> DataFrame:
    """Windowed ingest monitoring: docs + avg length per 1-minute
    warc_ts window, late data bounded by a 5-minute watermark."""
    return (
        pages_stream.withWatermark("warc_ts", "5 minutes")
        .groupBy(F.window("warc_ts", "1 minute"))
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
    )
