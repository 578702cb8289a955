"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas
iterators (mapInPandas).

The decode step itself is STUBBED (image/audio libraries are not in
this environment): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
from the bytes' md5 -- so the Spark-side plumbing (schema, batch
iteration, partition parallelism, UDF signature) is real and tested
while the codec is swappable.

At 100 TB: binary payloads ride in their own column (parquet keeps them
out of unrelated scans via column pruning); decode fan-out happens in
mapInPandas so each Arrow batch streams through a Python worker without
driver involvement; per-file blobs would come in via
spark.read.format("binaryFile").
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def decode_stub(payload: bytes, fake: bool = False) -> dict:
    """Codec seam.  Real deployments replace this with PIL/ffmpeg."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    h = hashlib.md5(payload).digest()
    return {
        "format": ["jpeg", "png", "wav", "mp4"][h[0] % 4],
        "width": 16 + h[1] % 240,
        "height": 16 + h[2] % 240,
        "n_frames": 1 + h[3] % 32,
    }


def attach_binary(df: DataFrame, text_col: str = "text",
                  out_col: str = "payload") -> DataFrame:
    """Synthesize an opaque binary column (UTF-8 bytes of text) -- the
    testdata has no real media, so this provides the binary plumbing."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = decode_stub(raw, fake=fake)
                rows.append({
                    "doc_id": doc_id, "n_bytes": len(raw), **meta,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODED_SCHEMA)


# --- feature extraction -----------------------------------------------------

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Media -> fixed-dim feature vector (the embedding-model seam).

    Fake codec: FEATURE_DIM floats from the payload md5, each byte
    scaled to [0, 1).  Real deployments swap in CLIP/wav2vec etc.; the
    Spark side (Arrow batches, array<float> output column ready for the
    similarity operators) is identical either way."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError("feature models unavailable; fake=True")
                h = hashlib.md5(raw).digest()
                out.append({
                    "doc_id": doc_id,
                    "features": [h[i] / 256.0 for i in range(FEATURE_DIM)],
                })
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return df.select(id_col, payload_col).mapInPandas(feat_batches, FEATURES_SCHEMA)


# --- resize -----------------------------------------------------------------

RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumb", BinaryType()),
])


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 64,
                 id_col: str = "doc_id", payload_col: str = "payload",
                 fake: bool = True) -> DataFrame:
    """Media -> bounded thumbnail.  Aspect ratio is preserved: the
    decoded (width, height) scales down to fit (target_w, target_h),
    never up.  Fake codec: thumbnail bytes are md5(payload | 'WxH')."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = decode_stub(raw, fake=fake)
                scale = min(target_w / meta["width"], target_h / meta["height"], 1.0)
                w, h = max(1, int(meta["width"] * scale)), max(1, int(meta["height"] * scale))
                thumb = hashlib.md5(raw + f"|{w}x{h}".encode()).digest()
                out.append({"doc_id": doc_id, "width": w, "height": h, "thumb": thumb})
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "thumb"])

    return df.select(id_col, payload_col).mapInPandas(resize_batches, RESIZED_SCHEMA)


# --- frame sampling ---------------------------------------------------------

FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def frame_sample(df: DataFrame, every_k: int = 4, id_col: str = "doc_id",
                 payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Video -> every k-th frame, one output row per sampled frame (the
    1->N fan-out shape: mapInPandas yields more rows than it consumes,
    so the explode happens executor-side with no driver involvement).
    Fake codec: frame bytes are md5(payload | '|' | idx)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = decode_stub(raw, fake=fake)
                for idx in range(0, meta["n_frames"], every_k):
                    frame = hashlib.md5(raw + b"|" + str(idx).encode()).digest()
                    out.append({"doc_id": doc_id, "frame_idx": idx, "frame": frame})
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return df.select(id_col, payload_col).mapInPandas(frame_batches, FRAMES_SCHEMA)
