"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature plumbing.

Design (the 100 TB shape): media lives as an opaque ``binary`` column
(or an object-store URI for large assets) beside typed metadata columns.
Decode / resize / frame-sample run as ``mapInPandas`` batch iterators —
Arrow moves the bytes to Python in columnar batches, one Python worker
per partition, no per-row serde.

The image decode is REAL for PNG / JPEG / GIF: ``parse_image_header``
reads the container headers with ``struct`` alone (PNG IHDR, JPEG
SOFn frame header, GIF logical-screen descriptor) — no imaging library
needed, and it is exactly what a metadata-extraction pass over a media
lake does (full pixel decode only happens in the downstream transform
that needs pixels). Unknown formats fall back to ``decode_image_stub``
(deterministic fake) so the pipeline shape stays total. Pixel-level ops
(resample in ``resize_images``) would call PIL/ffmpeg in production;
their byte-level bodies remain deterministic stand-ins behind the same
Arrow plumbing.

spark.sql.execution.arrow.maxRecordsPerBatch bounds decode batch memory:
with ~N MB media payloads set it so batch_bytes ≈ 64-256 MB.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def make_png(width: int, height: int, gray: int = 0x7F) -> bytes:
    """A fully valid 8-bit grayscale PNG of the given dimensions, built
    with stdlib only (struct + zlib): signature, IHDR, one IDAT holding
    the filtered scanlines, IEND — all with correct CRCs. Any compliant
    decoder opens it."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = (b"\x00" + bytes([gray]) * width) * height  # filter 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int) -> bytes:
    """A header-valid JPEG: SOI, JFIF APP0, a correct SOF0 frame header
    carrying the dimensions, EOI. (No entropy-coded scan — sufficient
    for any header/dimension parser, which is the decode stage this
    module implements.)"""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"  # 1 component
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"  # EOI
    )


def make_gif(width: int, height: int) -> bytes:
    """A minimal valid GIF89a: header, logical screen descriptor with
    the dimensions (little-endian), 2-entry palette, trailer."""
    screen = struct.pack("<HH", width, height) + b"\x80\x00\x00"  # GCT flag, 2 colors
    palette = b"\x00\x00\x00\xff\xff\xff"
    return b"GIF89a" + screen + palette + b"\x3b"


def parse_image_header(payload: bytes) -> dict | None:
    """Real image metadata decode via container headers (struct only):

    - PNG: 8-byte signature, then IHDR — width/height are the two
      big-endian u32 at bytes 16..24.
    - JPEG: walk the marker stream from SOI; any SOFn frame marker
      (0xC0-0xCF except DHT 0xC4, DAC 0xCC) carries precision(1) +
      height(2) + width(2) big-endian after the segment length.
    - GIF: 'GIF87a'/'GIF89a', then the logical-screen descriptor's
      little-endian u16 width/height at bytes 6..10.

    Returns None for anything unrecognized/truncated (caller decides
    the fallback)."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": w, "height": h}
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None  # broken marker stream
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > len(payload):
                    return None
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": w, "height": h}
            pos += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    return None


def decode_image_stub(payload: bytes) -> dict:
    """Fallback for UNKNOWN formats only (parse_image_header handles
    PNG/JPEG/GIF for real): deterministic fake decode deriving
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


def attach_synthetic_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test-fixture media generator: a REAL image payload per document
    (format cycles png/jpeg/gif by id; dimensions derived from the text
    length so an external oracle can predict them):

        width  = 1 + length(text) mod 512
        height = 1 + (7 * length(text)) mod 512

    The PNGs are fully valid files (zlib IDAT + CRCs); JPEG/GIF are
    header-valid. This is the synthesis side of the decode round-trip —
    production replaces it with binaryFile ingestion
    (sources/loaders.load_media_dir)."""
    makers = (make_png, make_jpeg, make_gif)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n = len(text)
                payloads.append(makers[int(doc_id) % 3](1 + n % 512, 1 + (7 * n) % 512))
            yield pd.DataFrame({"doc_id": pdf[id_col], "media": payloads})

    out_schema = T.StructType([T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())])
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(synth, out_schema)


def decode_image(payload: bytes) -> dict:
    """Decode one payload's metadata: real header parse for PNG/JPEG/GIF,
    deterministic stub for unrecognized bytes (format tagged 'unknown'
    so downstream can quarantine)."""
    meta = parse_image_header(bytes(payload))
    if meta is None:
        meta = dict(decode_image_stub(bytes(payload)), format="unknown")
    meta["sha256"] = hashlib.sha256(bytes(payload)).hexdigest()
    return meta


def decode_images(media: DataFrame) -> DataFrame:
    """mapInPandas decode: per-partition Arrow batches in, metadata rows
    out. PNG/JPEG/GIF dimensions come from the actual container headers
    (parse_image_header); only unrecognized formats hit the stub."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image(p) for p in pdf["media"]]
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
    """Resize: source dimensions come from the REAL header parse
    (decode_image), the output dimensions are the exact clamp a
    resampler would produce; the payload body is a deterministic
    truncation stand-in (production: PIL thumbnail + re-encode inside
    the same batch loop)."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                meta = decode_image(bytes(payload))
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
