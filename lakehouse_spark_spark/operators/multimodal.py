"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature plumbing.

Design (the 100 TB shape): media lives as an opaque ``binary`` column
(or an object-store URI for large assets) beside typed metadata columns.
Decode / resize / frame-sample run as ``mapInPandas`` batch iterators —
Arrow moves the bytes to Python in columnar batches, one Python worker
per partition, no per-row serde. The Spark-side plumbing here (schemas,
batch iteration, partition sizing) is real and tested; the actual codec
call is stubbed (``decode_image_stub``) because media libraries are not
available in this environment — swap the stub body for PIL/ffmpeg in
production.

spark.sql.execution.arrow.maxRecordsPerBatch bounds decode batch memory:
with ~N MB media payloads set it so batch_bytes ≈ 64-256 MB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Decoded-media metadata schema appended by decode_images().
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_size_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic stand-in for a real media column: the document text
    encoded as bytes. Gives the decode path a real binary column with
    realistic size variance."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("media"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB codec: deterministic fake decode. A real implementation
    would call PIL.Image.open(BytesIO(payload)) here; this derives
    width/height/format from a stable hash of the bytes so tests are
    reproducible. Raises on empty payloads the way a codec would."""
    if not payload:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(payload).hexdigest()
    seed = int(digest[:8], 16)
    return {
        "format": ("png", "jpeg", "webp")[seed % 3],
        "width": 64 + (seed % 1024),
        "height": 64 + ((seed >> 10) % 1024),
        "sha256": digest,
    }


def decode_images(media: DataFrame) -> DataFrame:
    """mapInPandas decode: per-partition Arrow batches in, metadata
    rows out. The batch loop is the real production shape — only the
    codec inside is stubbed."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image_stub(p) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_size_bytes": [len(p) for p in pdf["media"]],
                    "format": [m["format"] for m in meta],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "sha256": [m["sha256"] for m in meta],
                }
            )

    return media.mapInPandas(decode_batches, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stub: emits a (deterministically truncated) payload plus
    the clamped dimensions a real resampler would produce. Real impl:
    PIL thumbnail + re-encode inside the same batch loop."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                meta = decode_image_stub(bytes(payload))
                scale = min(1.0, max_side / max(meta["width"], meta["height"]))
                w, h = max(1, int(meta["width"] * scale)), max(1, int(meta["height"] * scale))
                fake_resized = bytes(payload)[: max(1, int(len(payload) * scale * scale))]
                rows.append((doc_id, fake_resized, w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "media", "width", "height"])

    return media.mapInPandas(do, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: a 'video' payload yields every Nth 'frame'
    (deterministic byte slices). One input row fans out to many output
    rows — the mapInPandas iterator shape that matters for real ffmpeg
    sampling (output batches are NOT 1:1 with input rows)."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 16)
                for i in range(0, n_frames, every_n):
                    rows.append((doc_id, i, payload[i * 16 : (i + 1) * 16]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(do, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Audio feature stub: deterministic pseudo-MFCC vector per payload
    (byte-derived). Real impl: soundfile/librosa in the same loop; the
    Arrow-batched array<float> output column is the part that matters —
    it feeds straight into the embedding similarity operators."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload)
                dur = len(payload) / 1000.0
                rms = (sum(b * b for b in payload[:1000]) / max(1, min(len(payload), 1000))) ** 0.5
                if payload:
                    feats = [float((payload[i % len(payload)] - 128) / 128.0) for i in range(n_features)]
                else:  # empty media: zero-vector, consistent with dur/rms guards
                    feats = [0.0] * n_features
                rows.append((doc_id, dur, rms, feats))
            yield pd.DataFrame(rows, columns=["doc_id", "duration_s", "rms", "features"])

    return media.mapInPandas(do, AUDIO_FEATURE_SCHEMA)
