"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction / frame-sampling operators
implemented as Arrow-batched mapInPandas pipelines.

The sandbox has no image/audio libraries, so the actual byte decoding
is STUBBED: ``decoder="real"`` raises NotImplementedError at the
import boundary; ``decoder="fake"`` (default, clearly marked) derives
deterministic pseudo-features from md5 of the bytes so the Spark-side
plumbing — schema, partitioning, UDF signatures, batch shapes — is
real and tested end-to-end. The fake decoder is md5-based ON PURPOSE:
md5 exists in DuckDB too, so every fake-decoded output has an exact
SQL twin and the whole mapInPandas pipeline is value-hash-checked by
the driver, not just row-counted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEAT_DIM = 8

MEDIA_SCHEMA = (
    "media_id long, mime string, content binary, width int, height int, duration_s double"
)
FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, feat array<double>"
)
FRAMES_SCHEMA = "media_id long, frame_idx int, offset_s double, frame_hash string"


def documents_to_media(documents: DataFrame) -> DataFrame:
    """Deterministic fixture media table: each document's text bytes
    as an opaque 'image' payload with synthetic metadata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "UTF-8").alias("content"),
        (F.pmod(F.col("doc_id"), F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 32).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), F.lit(300)) / 10.0).alias("duration_s"),
    )


def _require_real_decoder() -> None:
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "real image decode requires Pillow, not present in this "
            "container; use decoder='fake' for plumbing tests"
        ) from exc


def _fake_features(content: bytes) -> np.ndarray:
    digest = hashlib.md5(content or b"").digest()
    return (
        np.frombuffer(digest[:FEAT_DIM], dtype=np.uint8).astype(np.float64) / 255.0
    )


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract per media row (Arrow batches)."""
    if decoder == "real":
        _require_real_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": pdf["content"].map(lambda b: len(b or b"")),
                    "feat": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling: n evenly spaced offsets within
    duration; frame 'decode' is the stubbed hash of (content, idx).

    Pure column expressions — explode(sequence) row expansion plus a
    JVM-side md5 — no Python in the path (the earlier mapInPandas +
    itertuples formulation was per-row Python for work codegen does
    for free). The frame salt is the ASCII decimal index, so the twin
    is ``md5(text || CAST(i AS VARCHAR))`` in any SQL engine."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    frames = media.select("media_id", "content", "duration_s", idx)
    return frames.select(
        "media_id",
        "frame_idx",
        F.round(F.col("duration_s") * F.col("frame_idx") / n_frames, 6).alias(
            "offset_s"
        ),
        F.md5(
            F.concat(
                F.col("content"),
                F.encode(F.col("frame_idx").cast("string"), "UTF-8"),
            )
        ).alias("frame_hash"),
    )
