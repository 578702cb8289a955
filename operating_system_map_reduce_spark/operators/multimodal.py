"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas
iterators (mapInPandas).

The codec is an injectable seam with two implementations:

- ``FakeCodec`` -- deterministic test double deriving metadata /
  thumbnails / frames from the payload md5.  This is what the
  oracle-gated queries use (the sandbox has no media libraries), so the
  Spark-side plumbing (schema, batch iteration, partition parallelism,
  UDF signature, 1->N fan-out) is real and tested while decode itself
  is hermetic.
- ``PilCodec`` -- real image decode via Pillow when importable:
  metadata from ``Image.open``, resize via ``thumbnail``, frames via
  ``seek``.  Constructing it without PIL raises NotImplementedError.

Operators take ``codec=``; with ``codec=None`` resolution is:
explicit codec > ``fake=True`` -> FakeCodec > PIL importable ->
PilCodec > NotImplementedError.  The codec object is pickled into the
mapInPandas closure, so implementations must be import-light and
stateless (PIL is imported lazily inside methods, on the executor).

At 100 TB: binary payloads ride in their own column (parquet keeps them
out of unrelated scans via column pruning); decode fan-out happens in
mapInPandas so each Arrow batch streams through a Python worker without
driver involvement; per-file blobs would come in via
spark.read.format("binaryFile").
"""

from __future__ import annotations

import hashlib
import importlib.util
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


class FakeCodec:
    """Deterministic codec double: every output is a pure function of
    the payload bytes, so results are stable across executors, runs,
    and engines (the DuckDB oracles replay the same md5 arithmetic)."""

    def decode(self, payload: bytes) -> dict:
        h = hashlib.md5(payload).digest()
        return {
            "format": ["jpeg", "png", "wav", "mp4"][h[0] % 4],
            "width": 16 + h[1] % 240,
            "height": 16 + h[2] % 240,
            "n_frames": 1 + h[3] % 32,
        }

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        return hashlib.md5(payload + f"|{w}x{h}".encode()).digest()

    def frame(self, payload: bytes, idx: int) -> bytes:
        return hashlib.md5(payload + b"|" + str(idx).encode()).digest()


def pil_available() -> bool:
    return importlib.util.find_spec("PIL") is not None


class PilCodec:
    """Real image codec via Pillow.  Import-light: PIL loads inside the
    methods (executor-side), the instance itself pickles trivially."""

    def __init__(self) -> None:
        if not pil_available():
            raise NotImplementedError(
                "PilCodec requires Pillow; install it or use FakeCodec"
            )

    @staticmethod
    def _open(payload: bytes):
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload))

    def decode(self, payload: bytes) -> dict:
        img = self._open(payload)
        return {
            "format": (img.format or "unknown").lower(),
            "width": img.width,
            "height": img.height,
            "n_frames": int(getattr(img, "n_frames", 1)),
        }

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        import io

        img = self._open(payload)
        img.thumbnail((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def frame(self, payload: bytes, idx: int) -> bytes:
        import io

        img = self._open(payload)
        if getattr(img, "n_frames", 1) > 1:
            img.seek(idx)
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="PNG")
        return buf.getvalue()


def resolve_codec(fake: bool, codec=None):
    """explicit codec > fake double > PIL if importable > error."""
    if codec is not None:
        return codec
    if fake:
        return FakeCodec()
    if pil_available():
        return PilCodec()
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "pass fake=True for the deterministic test double or inject codec="
    )


def decode_stub(payload: bytes, fake: bool = False) -> dict:
    """Back-compat codec seam; prefer resolve_codec()/FakeCodec."""
    return resolve_codec(fake).decode(payload)


def attach_binary(df: DataFrame, text_col: str = "text",
                  out_col: str = "payload") -> DataFrame:
    """Synthesize an opaque binary column (UTF-8 bytes of text) -- the
    testdata has no real media, so this provides the binary plumbing."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", fake: bool = True,
                 codec=None) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload)."""
    cdc = resolve_codec(fake, codec)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = cdc.decode(raw)
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
                     payload_col: str = "payload", fake: bool = True,
                     featurizer=None) -> DataFrame:
    """Media -> fixed-dim feature vector (the embedding-model seam).

    Fake featurizer: FEATURE_DIM floats from the payload md5, each byte
    scaled to [0, 1).  Real deployments inject featurizer=(bytes ->
    list[float]) backed by CLIP/wav2vec etc.; the Spark side (Arrow
    batches, array<float> output column ready for the similarity
    operators) is identical either way."""
    if featurizer is None:
        if not fake:
            raise NotImplementedError(
                "feature models unavailable; pass fake=True or inject featurizer="
            )

        def featurizer(raw: bytes) -> list[float]:
            h = hashlib.md5(raw).digest()
            return [h[i] / 256.0 for i in range(FEATURE_DIM)]

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                out.append({"doc_id": doc_id, "features": featurizer(raw)})
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
                 fake: bool = True, codec=None) -> DataFrame:
    """Media -> bounded thumbnail.  Aspect ratio is preserved: the
    decoded (width, height) scales down to fit (target_w, target_h),
    never up.  Thumbnail bytes come from the codec's resize."""
    cdc = resolve_codec(fake, codec)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = cdc.decode(raw)
                scale = min(target_w / meta["width"], target_h / meta["height"], 1.0)
                w, h = max(1, int(meta["width"] * scale)), max(1, int(meta["height"] * scale))
                thumb = cdc.resize(raw, w, h)
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
                 payload_col: str = "payload", fake: bool = True,
                 codec=None) -> DataFrame:
    """Video -> every k-th frame, one output row per sampled frame (the
    1->N fan-out shape: mapInPandas yields more rows than it consumes,
    so the explode happens executor-side with no driver involvement).
    Frame bytes come from the codec's frame extractor."""
    cdc = resolve_codec(fake, codec)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = cdc.decode(raw)
                for idx in range(0, meta["n_frames"], every_k):
                    out.append({"doc_id": doc_id, "frame_idx": idx,
                                "frame": cdc.frame(raw, idx)})
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return df.select(id_col, payload_col).mapInPandas(frame_batches, FRAMES_SCHEMA)
