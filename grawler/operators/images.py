"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches.

Real (numpy, no external libs needed):
  decode_meta     decode bytes->pixels, emit (phash, w, h, mean RGB, ok)
  resize          block-mean downsample to (out_w, out_h), re-encoded rgb8
  features        compact feature vector: 3x per-channel mean/std + 8-bin
                  luma histogram -> array<float> (feeds similarity ops)

Stubbed (decoder libraries absent in this sandbox; the Spark plumbing —
schema, batch iteration, partitioning — is real and tested):
  audio_frame_sample / video_frame_sample raise NotImplementedError unless
  a deterministic fake is requested (fake=True samples synthetic frames so
  the pipeline shape can be exercised end-to-end).

All operators are mapInPandas (iterator-of-batches) so one Python worker
processes whole Arrow batches; no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .. import codecs

RESIZE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string")
FEATURE_DIM = 14  # 3 mean + 3 std + 8 luma-histogram bins


def _block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)  # empty block (upsample)
        for j in range(out_w):                     # -> nearest source pixel
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = px[y0:y1, x0:x1].mean(axis=(0, 1))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize(df: DataFrame, out_w: int = 16, out_h: int = 16,
           bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Decode -> block-mean resize -> re-encode rgb8. Schema preserved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for iid, raw, fmt in zip(pdf["image_id"], pdf[bytes_col],
                                     pdf[fmt_col]):
                try:
                    px = codecs.decode(bytes(raw), fmt)
                    small = _block_mean_resize(px, out_w, out_h)
                    out_rows.append(
                        (iid, codecs.encode_rgb8(small), out_w, out_h,
                         "rgb8"))
                except Exception:
                    continue
            yield pd.DataFrame(
                out_rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", bytes_col, fmt_col).mapInPandas(
        run, schema=RESIZE_SCHEMA)


def feature_vec(px: np.ndarray) -> np.ndarray:
    """Pure feature math shared by the Spark operator and the offline
    oracle generator (tools/gen_value_oracles.py): 3x per-channel mean/std
    + 8-bin luma histogram, (FEATURE_DIM,) float64."""
    fpx = px.astype(np.float64)
    mean = fpx.mean(axis=(0, 1)) / 255.0
    std = fpx.std(axis=(0, 1)) / 255.0
    luma = fpx @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0, 255))
    hist = hist / max(1, luma.size)
    return np.concatenate([mean, std, hist])


def features(df: DataFrame, bytes_col: str = "bytes",
             fmt_col: str = "fmt") -> DataFrame:
    """Per-image feature vector (array<float>, FEATURE_DIM dims)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for iid, raw, fmt in zip(pdf["image_id"], pdf[bytes_col],
                                     pdf[fmt_col]):
                try:
                    px = codecs.decode(bytes(raw), fmt)
                except Exception:
                    continue
                ids.append(iid)
                vecs.append([float(x) for x in feature_vec(px)])
            yield pd.DataFrame({"image_id": ids, "features": vecs})

    return df.select("image_id", bytes_col, fmt_col).mapInPandas(
        run, schema="image_id string, features array<double>")


def phash_neardup(df: DataFrame, id_col: str = "image_id",
                  phash_col: str = "phash",
                  max_hamming: int = 6, n_bands: int = 8) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance
    (id_a < id_b, hamming <= max_hamming) — the image-payload sibling of
    text simhash dedup, sharing the banded-bucket candidate join
    (dedup.hamming_band_pairs): 8 disjoint 8-bit bands guarantee any pair
    within hamming 6 collides in >=1 band; bucket equi-join, never
    all-pairs."""
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(
        df.select(id_col, phash_col), id_col, phash_col,
        max_hamming=max_hamming, n_bands=n_bands)


def audio_frame_sample(df: DataFrame, every_ms: int = 1000,
                       fake: bool = False) -> DataFrame:
    """STUB: audio decoders unavailable in this sandbox. With fake=True,
    emits deterministic pseudo-frames (xxhash-derived) so the downstream
    plumbing (explode to frame rows, schema, partitioning) runs for real."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "environment; pass fake=True for the deterministic test double")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(4)),
        lambda i: F.xxhash64(F.col("image_id"), i, F.lit(every_ms)),
    )
    return df.select(
        "image_id", F.posexplode(frames).alias("frame_idx", "frame_sig"))


def video_frame_sample(df: DataFrame, fps: float = 1.0,
                       fake: bool = False) -> DataFrame:
    """STUB, same policy as audio_frame_sample."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a video library not present in this "
            "environment; pass fake=True for the deterministic test double")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda i: F.xxhash64(F.col("image_id"), i),
    )
    return df.select(
        "image_id", F.posexplode(frames).alias("frame_idx", "frame_sig"))
