"""Multimodal column plumbing (task brief).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested; the actual codec calls are STUBBED
(``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``) because no image/audio libraries ship in this environment.
A deterministic fake decoder stands in so shapes and determinism are testable.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real impl would decode + resize + embed (e.g. pillow+model).

    ``fake=True`` produces a deterministic 8-dim byte-histogram feature so the
    distributed plumbing is exercisable without codecs.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = float(len(payload)) or 1.0
    return [h / total for h in hist]


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real impl would decode + frame-sample + embed."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    # deterministic fake: energy proxy per 4-byte frame bucket, 8 buckets
    n = max(len(payload) // 8, 1)
    return [sum(payload[i * n:(i + 1) * n]) / (255.0 * n + 1e-9) for i in range(8)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches — one batch of binary
    payloads per task, no per-row Python UDF calls from the JVM's view."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                decoder = decode_image if kind == "image" else decode_audio
                rows.append((mid, kind, len(payload), decoder(bytes(payload), fake=fake)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "n_bytes", "feature"])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def resize_image(payload: bytes, width: int, height: int,
                 out_w: int, out_h: int, fake: bool = False) -> bytes:
    """STUB: real impl would decode, resample (e.g. pillow LANCZOS), and
    re-encode.  ``fake=True`` treats the payload as a row-major byte grid of
    (height, width) and nearest-neighbor samples it to (out_h, out_w) —
    deterministic, so the distributed resize pipeline is testable."""
    if not fake:
        raise NotImplementedError(
            "image resizing requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    if width <= 0 or height <= 0 or len(payload) < width * height:
        return b""
    out = bytearray()
    for y in range(out_h):
        sy = y * height // out_h
        for x in range(out_w):
            sx = x * width // out_w
            out.append(payload[sy * width + sx])
    return bytes(out)


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  fake: bool = True) -> DataFrame:
    """Distributed resize: one Arrow batch of binary payloads per task.
    Returns (media_id, payload binary) with the resampled bytes."""
    schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"],
                                          pdf["width"], pdf["height"]):
                # nullable int columns arrive as float NaN through pandas
                # (NaN is truthy, so `w or 0` would NOT guard it)
                w = 0 if pd.isna(w) else int(w)
                h = 0 if pd.isna(h) else int(h)
                rows.append((mid, resize_image(bytes(payload), w, h,
                                               out_w, out_h, fake=fake)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    cols = media.filter(F.col("kind") == "image").select(
        "media_id", "payload",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"))
    return cols.mapInPandas(run, schema)


def embed_media(media: DataFrame, dim: int = 16, seed: int = 42,
                fake: bool = True) -> DataFrame:
    """Media -> fixed-dim embedding column (``array<float>``), the bridge
    into the similarity-search operators: the decode/feature step is the
    (stubbed) codec path; the projection to ``dim`` dims is a seeded
    deterministic random matrix applied batch-wise with numpy — the exact
    shape a real encoder output would take.  Output feeds
    ``operators/similarity`` unchanged (see test_multimodal_ann_end_to_end).
    """
    import numpy as np

    feats = extract_features(media, fake=fake)
    schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        proj = rng.standard_normal((8, dim))
        for pdf in batches:
            mat = np.array(pdf["feature"].tolist(), dtype=np.float64)
            if len(mat) == 0:
                yield pd.DataFrame(columns=["media_id", "embedding"])
                continue
            emb = mat @ proj
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.where(norms == 0, 1.0, norms)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "embedding": [row.astype(np.float32).tolist()
                                              for row in emb]})

    return feats.mapInPandas(run, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands (media_id, duration_ms) into
    (media_id, frame_ts_ms) rows via ``sequence`` — pure JVM; the decode of
    each frame would ride extract_features."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
