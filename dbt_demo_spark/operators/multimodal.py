"""Multimodal column plumbing: treat image/audio/video payloads as opaque
`binary` columns with typed metadata, processed by Arrow-batched Pandas
functions over `mapInPandas`.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake derived from the payload bytes, or NotImplementedError
in strict mode) — but everything Spark-side is real and tested: the binary
schema, the mapInPandas batch shape, the output StructType, and the
partitioning story (payload tables partitioned by modality; metadata
extraction is embarrassingly parallel so the only scale concern is batch
size via spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

PAYLOAD_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video | text
    StructField("payload", BinaryType()),
])

DECODED_META_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("modality", StringType()),
    StructField("byte_len", LongType()),
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),        # fake-decoded dimensions
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def to_payload_table(docs: DataFrame, modality: str = "text",
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text table as a payload table (UTF-8 bytes) — the test stand-in
    for real image/audio payload parquet."""
    return docs.select(
        F.col(id_col).alias("item_id"),
        F.lit(modality).alias("modality"),
        F.col(text_col).cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derived from content.
    Replace with PIL / torchaudio / pyav in a real deployment — or pass a
    real implementation as the ``decoder`` argument of ``decode_metadata``
    without touching this module (r5 item 5)."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 32


def decode_metadata(payloads: DataFrame, strict: bool = False,
                    decoder=None) -> DataFrame:
    """mapInPandas metadata extraction: one Arrow batch in, one batch out.

    ``decoder``: optional ``bytes -> (width, height, n_frames)`` callable —
    the pluggable codec seam.  A real deployment passes e.g. a PIL/pyav
    wrapper; the callable is closure-shipped to the Python workers like
    any pandas function, so plugging a codec requires no edit here.  With
    no decoder, strict=True raises NotImplementedError where the codec
    would run — marking exactly the integration point — and strict=False
    uses the deterministic synthetic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder
        for pdf in batches:
            if dec is None and strict:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass decoder= or plug into _fake_decode")
            # bytes() normalization: the same contract as the other two
            # decoder seams, whatever type Arrow hands the binary column as
            decoded = [(dec or _fake_decode)(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "item_id": pdf["item_id"],
                "modality": pdf["modality"],
                "byte_len": [len(p) for p in pdf["payload"]],
                "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_frames": [d[2] for d in decoded],
            })

    return payloads.mapInPandas(run, DECODED_META_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_offset", LongType()),
    StructField("frame", BinaryType()),
])


def sample_frames(payloads: DataFrame, n_frames: int = 4,
                  frame_len: int = 64, decoder=None) -> DataFrame:
    """Frame sampling for video/audio payloads: one row PER FRAME
    (item_id, frame_idx, frame_offset, frame bytes), evenly spaced over
    the decoded stream.

    ``decoder``: optional ``bytes -> list[bytes]`` callable returning the
    payload's full decoded frame sequence (a pyav/ffmpeg wrapper in a real
    deployment) — the operator then samples ``n_frames`` evenly from it
    and reports frame_offset as the SOURCE frame index.  Without a
    decoder, frames are raw byte slices (frame_offset = byte offset), so
    the Spark-side plumbing — fan-out row multiplication inside
    mapInPandas, binary frame column, deterministic offsets — stays real
    and testable in a codec-less container.  Embarrassingly parallel;
    downstream per-frame operators (feature extraction) see an ordinary
    table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder
        for pdf in batches:
            rows = {"item_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                if dec is not None:
                    frames = dec(bytes(payload)) or [b""]
                    n = len(frames)
                    for i in range(n_frames):
                        off = (i * n) // n_frames
                        rows["item_id"].append(item_id)
                        rows["frame_idx"].append(i)
                        rows["frame_offset"].append(off)
                        rows["frame"].append(bytes(frames[off]))
                    continue
                # codec-less fallback: evenly spaced byte slices
                n = max(len(payload), 1)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    rows["item_id"].append(item_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame"].append(bytes(payload[off:off + frame_len]))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("feature", StringType()),       # 'mean','std','entropy_q'
    StructField("value", DoubleType()),
])


def extract_features(payloads: DataFrame, decoder=None) -> DataFrame:
    """Per-payload numeric features (byte mean / std / coarse entropy) via
    numpy over the Arrow batch — the feature-extraction stage shape.

    ``decoder``: optional ``bytes -> 1-D uint8 ndarray`` callable (pixels,
    PCM samples, ...) the statistics are computed over instead of the raw
    payload bytes — the pluggable codec seam; with a real codec the same
    structure computes pixel/spectrogram statistics.  Features emit as
    long-form (item_id, feature, value) rows so new features never change
    the schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        dec = decoder
        for pdf in batches:
            out = {"item_id": [], "feature": [], "value": []}
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                if dec is not None:
                    b = np.asarray(dec(bytes(payload)), dtype=np.uint8).ravel()
                else:
                    b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if b.size == 0:
                    b = np.zeros(1, dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=16).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                for feat, val in (("mean", float(b.mean())),
                                  ("std", float(b.std())),
                                  ("entropy_q", float(-(nz * np.log2(nz)).sum()))):
                    out["item_id"].append(item_id)
                    out["feature"].append(feat)
                    out["value"].append(val)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def payload_stats(payloads: DataFrame) -> DataFrame:
    """JVM-side payload statistics (no Python): byte length + sha256 —
    the cheap always-available metadata path."""
    return payloads.select(
        "item_id", "modality",
        # long, not int: metadata columns are int64 across the engine (and
        # the DuckDB oracle's length() is BIGINT)
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )
