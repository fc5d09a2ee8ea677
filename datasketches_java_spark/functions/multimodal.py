"""Multimodal (image/audio/video) column plumbing.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata structs; every transform here is an Arrow-batched
``mapInPandas`` so the Spark-side contract — schema, batch shape,
partition behavior — is real and tested, while the actual codec work
is stubbed (image/audio libraries are not in this container):

  - ``decode_image`` / ``decode_audio``: deterministic fake decoder
    (seeded from a content hash) behind ``fake=True``; with
    ``fake=False`` they raise NotImplementedError where a real
    Pillow/libsndfile call would go.
  - ``image_features``: per-image fixed-width float vector (the shape
    an embedding model would emit) from the fake pixels.
  - ``frame_sample``: deterministic frame-index sampling for video
    byte streams (metadata-only: picks offsets, no codec).

Scale notes: batches stay columnar end-to-end (one numpy block per
Arrow batch), media bytes never round-trip through Python row objects,
and all outputs carry the input id so downstream joins are
broadcast/equi-joins, never positional.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])


def _content_seed(buf: bytes) -> int:
    return int.from_bytes(hashlib.sha256(buf or b"").digest()[:8], "little")


def _fake_pixels(buf: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pixels from the content hash — a stand-in for a
    real decoder with the same dtype/shape contract (uint8 HxWx3)."""
    rng = np.random.default_rng(_content_seed(buf))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def decode_image(df: DataFrame, binary_col: str, id_col: str,
                 width: int = 32, height: int = 32,
                 fake: bool = True) -> DataFrame:
    """binary → (id, meta struct, pixels flat uint8 array).

    Real decoders (Pillow / turbojpeg) drop in at the marked line;
    everything around them — Arrow batching, output schema, the
    columnar pixel layout — is the production plumbing.
    """
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("meta", IMAGE_META),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[binary_col]):
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires Pillow; not in container")
                px = _fake_pixels(buf, width, height)  # <- real decoder here
                rows.append((rid, (width, height, 3, "fake-rgb"),
                             px.ravel().tolist()))
            yield pd.DataFrame(rows, columns=[id_col, "meta", "pixels"])

    return df.select(id_col, binary_col).mapInPandas(run, schema)


def image_features(df: DataFrame, pixels_col: str, id_col: str,
                   dim: int = 64) -> DataFrame:
    """pixels → fixed-width float feature vector (mean-pooled blocks —
    the batch shape an embedding model produces)."""
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack([np.asarray(p, dtype=np.float32) for p in pdf[pixels_col]])
            blocks = np.array_split(X, dim, axis=1)        # one BLAS-ish pass
            feats = np.stack([b.mean(axis=1) for b in blocks], axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "features": list(feats.astype(np.float32))})

    return df.select(id_col, pixels_col).mapInPandas(run, schema)


def frame_sample(df: DataFrame, binary_col: str, id_col: str,
                 n_frames: int = 4, frame_size: int = 1024) -> DataFrame:
    """Deterministic frame-offset sampling over a video byte stream:
    evenly spaced ``n_frames`` offsets, each a fixed-size byte slice
    (codec-free; a real demuxer replaces the slicer)."""
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[binary_col]):
                buf = buf or b""
                step = max(len(buf) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(buf) - 1, 0))
                    rows.append((rid, i, buf[off:off + frame_size]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return df.select(id_col, binary_col).mapInPandas(run, schema)


def audio_stats(df: DataFrame, binary_col: str, id_col: str,
                fake: bool = True) -> DataFrame:
    """binary audio → (id, n_samples, rms) — fake PCM interpretation of
    the byte stream (a real libsndfile decode drops in)."""
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[binary_col]):
                if not fake:
                    raise NotImplementedError(
                        "real audio decode requires libsndfile; not in container")
                pcm = np.frombuffer((buf or b"\x00\x00")[: (len(buf or b"12") // 2) * 2],
                                    dtype=np.int16).astype(np.float64)
                rows.append((rid, len(pcm),
                             float(np.sqrt(np.mean(pcm ** 2))) if len(pcm) else 0.0))
            yield pd.DataFrame(rows, columns=[id_col, "n_samples", "rms"])

    return df.select(id_col, binary_col).mapInPandas(run, schema)
