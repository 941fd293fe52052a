"""Multimodal (image/audio/video) column plumbing: opaque ``binary``
payloads + typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery — schema, partition sizing, UDF signature,
batch shape — is real and tested; the actual media decode is stubbed
(codec libs are not in this container): ``decode_stub`` derives
deterministic fake metadata from the payload bytes, and
``HAVE_REAL_CODECS`` gates where a PIL/ffmpeg decode would slot in.

Scale posture: payload rows are wide → keep
``spark.sql.files.maxPartitionBytes`` modest and let AQE coalesce;
feature extraction is an embarrassingly parallel mapInPandas with no
shuffle; downstream joins use only the (key, metadata/features)
projection, never the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HAVE_REAL_CODECS = False
try:  # pragma: no cover - not available in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except ImportError:
    pass

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Test fixture: derive a deterministic binary payload from a text
    column (stands in for raw image/audio bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def decode_real(payload: bytes, media_type: str = "image") -> dict:
    """The real-codec slot (PIL/libav behind the same signature) —
    intentionally unimplemented in this container."""
    raise NotImplementedError("wire PIL/libav decode here; use decode_stub for tests")


def decode_stub(payload: bytes, media_type: str = "image") -> dict:
    """Deterministic fake decode: metadata derived from payload
    bytes. Always available (never gated on whether PIL happens to be
    importable — a heterogeneous cluster must not flip behavior per
    executor); swap extract_media_metadata to decode_real for a
    production deployment."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "media_type": media_type,
        "n_bytes": len(payload or b""),
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "duration_ms": int.from_bytes(h[2:4], "big") if media_type != "image" else 0,
    }


def extract_media_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image", out_col: str = "media_meta"
) -> DataFrame:
    """Decode/metadata stage as mapInPandas: payloads stream through
    Arrow batches; codec state would be initialized once per task."""
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, MEDIA_META_SCHEMA)])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(p, media_type) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def media_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 16, out_col: str = "media_feat"
) -> DataFrame:
    """Feature-extraction stage (resize/frame-sample equivalent):
    deterministic hashed byte-histogram features, L2-normalized —
    the exact UDF/batch shape a real CNN/CLIP encoder would use."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(p or b"\x00", dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                n = np.linalg.norm(hist)
                feats.append(list(hist / n if n > 0 else hist))
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(_feat, schema=out_schema)
