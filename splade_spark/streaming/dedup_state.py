"""Stateful streaming exact-dedup: emit each distinct text's FIRST
occurrence across micro-batches, suppress later duplicates.

The batch engine's exact_dedup (operators/dedup.py) canonicalizes
within one static relation; a continuously-ingesting Common-Crawl
pipeline needs the same decision made ONLINE with state that survives
micro-batch boundaries and restarts. This is the
``applyInPandasWithState`` formulation: stream grouped by content
hash, per-group state = "already emitted?" flag, output = first
arrival only. State lives in the streaming state store (RocksDB/HDFS
on a cluster), checkpointed with the query — a restart resumes with
the seen-set intact.

Scale: state is one boolean per DISTINCT text hash, partitioned by
the hash — the same key distribution as the batch groupBy, no skew
beyond duplicate-count skew, which salting cannot help here (the
whole point is one decision per hash).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "text_hash string, doc_id long, batch_first int"
STATE_SCHEMA = "seen int"


def _first_only(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    if seen:
        state.update((seen,))
        return
    best = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    if best is not None:
        state.update((1,))
        yield pd.DataFrame(
            {
                "text_hash": [key[0]],
                "doc_id": [int(best["doc_id"])],
                "batch_first": [1],
            }
        )


def stream_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """(text_hash, doc_id, batch_first): one row per distinct text,
    emitted on its first arrival; duplicates in later micro-batches
    produce nothing. ``docs_stream``: streaming (doc_id, text)."""
    hashed = docs_stream.select(
        F.md5(F.col("text")).alias("text_hash"), "doc_id"
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_only,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
