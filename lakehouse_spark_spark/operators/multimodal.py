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
