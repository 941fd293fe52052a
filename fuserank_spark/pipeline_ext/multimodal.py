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


def resize_media(
    df: DataFrame,
    *,
    width: int,
    height: int,
    payload_col: str = "payload",
    out_col: str = "resized_payload",
) -> DataFrame:
    """Resize stage plumbing (brief: decode/resize as pandas UDFs):
    mapInPandas over Arrow batches emitting a resized payload of
    ``width·height/64`` bytes per row — deterministic md5-keystream
    stub standing in for a PIL/libav resample (same batch shape,
    same schema contract; swap the inner loop for the real codec).
    Embarrassingly parallel, no shuffle; output size is bounded by
    the TARGET dims, so downstream stages size partitions off
    width×height, not source payload size."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    n_out = max(1, (width * height) // 64)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf[payload_col]:
                cur = hashlib.md5(
                    (bytes(p) if p is not None else b"")
                    + f"{width}x{height}".encode()
                ).digest()
                buf = bytearray()
                while len(buf) < n_out:
                    buf += cur
                    cur = hashlib.md5(cur).digest()
                outs.append(bytes(buf[:n_out]))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    *,
    meta_col: str = "media_meta",
    payload_col: str = "payload",
    every_ms: int = 5000,
    max_frames: int = 64,
    ts_col: str = "frame_ts_ms",
    frame_col: str = "frame_payload",
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled timestamp
    (0, every_ms, 2·every_ms, … capped at ``max_frames``), derived
    from the decoded ``duration_ms`` — PURE expressions (sequence +
    explode, descending-sequence trap guarded), so the fan-out stays
    in codegen and distributes with the scan; zero-duration rows
    (images) emit no frames. The per-frame payload is a
    deterministic md5 stub of (payload ‖ ts) — a real frame grab
    slots into a mapInPandas over (payload, ts) afterwards."""
    if every_ms <= 0 or max_frames <= 0:
        raise ValueError("every_ms and max_frames must be positive")
    dur = F.col(f"{meta_col}.duration_ms")
    n = F.least(
        F.floor(dur / F.lit(every_ms)).cast("bigint") + 1, F.lit(max_frames).cast("bigint")
    )
    idx = F.when(
        dur > 0, F.sequence(F.lit(0).cast("bigint"), n - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    out = df.withColumn("__fidx", F.explode(idx))
    ts = (F.col("__fidx") * every_ms).cast("bigint")
    frame = F.encode(
        F.md5(F.concat(F.col(payload_col), F.encode(ts.cast("string"), "utf-8"))),
        "utf-8",
    )
    return (
        out.withColumn(ts_col, ts).withColumn(frame_col, frame).drop("__fidx")
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (r6): dHash — the classic gradient hash — over a
# grayscale pixel grid, then banded-Hamming near-dup pairs via the
# shared dedup core. The DEDUP MECHANISM (bit code → bands → pair
# core → xor verify → cluster resolve) is the real, scale-tested part;
# the pixel SOURCE is the same deterministic md5-keystream stub the
# rest of this module uses (real codecs absent in this container), and
# because the keystream is md5-derived the ENTIRE hash is
# SQL-expressible — the DuckDB twin in tests/test_phash.py re-derives
# pixels → bits → code → pairs end-to-end. A production deployment
# swaps `stub_gray_pixels_expr` for a mapInPandas PIL decode
# (grayscale → resize to (grid_w+1)×grid_h) and keeps everything
# downstream byte-identical.


def stub_gray_pixels_expr(payload_col: str, n_pixels: int) -> "F.Column":
    """Deterministic fake grayscale pixels from a binary payload:
    byte ``p`` of the md5 keystream ``md5(payload‖'0') ‖
    md5(payload‖'1') ‖ …`` (chunk suffixes are the DECIMAL STRING of
    the chunk index, so any engine with md5-of-string can re-derive
    the stream). Returns the concatenated md5 HEX STRING of length
    ``>= 2 * n_pixels`` — the caller slices consecutive hex byte-pairs
    into 0–255 pixel values (see :func:`phash`). Pure expressions —
    the hex string is materialized by the caller once (Catalyst does
    not CSE across HOF projections, the CLAUDE.md trap), so call via
    :func:`phash`."""
    n_chunks = -(-n_pixels // 16)  # each md5 = 16 bytes = 32 hex chars
    chunks = [
        F.md5(F.concat(F.col(payload_col), F.encode(F.lit(str(c)), "utf-8")))
        for c in range(n_chunks)
    ]
    return F.concat(*chunks) if len(chunks) > 1 else chunks[0]


def phash(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    out_col: str = "phash",
    grid_w: int = 8,
    grid_h: int = 8,
) -> DataFrame:
    """64-bit dHash perceptual hash of a media payload: compare each
    grayscale pixel to its right neighbour on a ``(grid_w+1) ×
    grid_h`` grid; bit ``i = r*grid_w + c`` is set when
    ``px[r][c] > px[r][c+1]``. Near-identical images flip few bits, so
    Hamming distance on the code is visual similarity — feed
    :func:`phash_hamming_pairs`.

    Pure expressions end-to-end (md5-keystream stub pixels → one
    ``transform`` slicing hex byte-pairs → one ``aggregate`` folding
    bits): zero UDF, zero shuffle, constant-size plan for any grid.
    The code uses the FULL signed 64-bit range (bit grid_w*grid_h-1 is
    the BIGINT sign bit) — downstream band/xor math is sign-agnostic
    (see dedup.code_hamming_pairs)."""
    bits = grid_w * grid_h
    if bits > 64 or bits < 1:
        raise ValueError(f"grid_w*grid_h={bits} must be in 1..64 to fit a BIGINT code")
    row_w = grid_w + 1
    n_pixels = row_w * grid_h
    hex_col, px_col = "__ph_hex", "__ph_px"
    out = df.withColumn(hex_col, stub_gray_pixels_expr(payload_col, n_pixels))
    # pixels stay as 2-char lowercase-hex slices: fixed-width lowercase
    # hex compares LEXICOGRAPHICALLY identically to its numeric value
    # ('0'<'9'<'a'<'f' in ASCII), so the dHash greater-than needs no
    # hex→int conv. Paired A/B at 500k: wall-flat vs the conv form —
    # kept for the simpler plan and because the string-compare
    # property holds verbatim in any SQL engine
    out = out.withColumn(
        px_col,
        F.expr(
            f"transform(sequence(0, {n_pixels - 1}), p -> "
            f"substr({hex_col}, p * 2 + 1, 2))"
        ),
    )
    # element_at is 1-based; left pixel of bit i sits at r*row_w + c
    # where r = i div grid_w, c = i mod grid_w
    code = F.expr(
        f"""
        aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) ->
          acc + IF(
            element_at({px_col}, CAST(i div {grid_w} AS INT) * {row_w} + CAST(pmod(i, {grid_w}) AS INT) + 1)
            > element_at({px_col}, CAST(i div {grid_w} AS INT) * {row_w} + CAST(pmod(i, {grid_w}) AS INT) + 2),
            shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))
        """
    )
    return out.withColumn(out_col, code).drop(hex_col, px_col)


def phash_hamming_pairs(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    key_col: str = "doc_id",
    grid_w: int = 8,
    grid_h: int = 8,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Near-duplicate MEDIA pairs by perceptual hash: :func:`phash`
    codes through the shared banded-Hamming prefilter
    (dedup.code_hamming_pairs — pigeonhole guarantees every pair
    within ``max_hamming <= bands-1`` surfaces; pair space stays
    linear in the corpus, mass-dup buckets star-degrade). Output
    (id_a < id_b, hamming) feeds resolve_duplicate_clusters /
    deduplicate exactly like the text pair streams — media dedup and
    text dedup share one clustering spine.

    Band-width vs depth trade (Manku et al.'s table construction):
    each band carries ``bits/bands`` bits, so a band has
    ``2^(bits/bands)`` possible values — that count, not the corpus,
    bounds the bucket fan-in. bands=8 over 64 bits (hamming depth 7)
    leaves 8-bit bands: 256 buckets per band, which DEGENERATES past
    a few thousand rows (measured 44 s at 500k, every bucket
    star-degraded). The default bands=4 / max_hamming=3 keeps 16-bit
    bands (65k values) — the standard near-dup depth. Go deeper only
    on pre-blocked subsets."""
    from .dedup import code_hamming_pairs

    coded = phash(df, payload_col=payload_col, grid_w=grid_w, grid_h=grid_h)
    return code_hamming_pairs(
        coded,
        "phash",
        key_col=key_col,
        bits=grid_w * grid_h,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
