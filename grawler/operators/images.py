"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches.

Real (numpy, no external libs needed):
  decode_meta     decode bytes->pixels, emit (phash, w, h, mean RGB, ok)
  resize          block-mean downsample to (out_w, out_h), re-encoded rgb8
  features        compact feature vector: 3x per-channel mean/std + 8-bin
                  luma histogram -> array<float> (feeds similarity ops)

Codec-seamed (no audio/video decoder library exists in this sandbox; the
Spark plumbing — schemas, Arrow batch iteration, per-frame row explosion,
feature extraction incl. the real phash on video frames — is fully
implemented and driver-verified):
  audio_frame_sample / video_frame_sample take a `decoder` callable; None
  raises NotImplementedError, and fake_pcm_decode / fake_frame_decode are
  deterministic numpy doubles the offline VALUES oracle replicates.

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
    if h % out_h == 0 and w % out_w == 0:
        # divisible dims (the common 2^k store sizes): one reshape-mean,
        # no Python loop. Block sums of uint8 are exact in float64, so
        # this is bit-identical to the general path below.
        bh, bw = h // out_h, w // out_w
        out = px.reshape(out_h, bh, out_w, bw, c).mean(axis=(1, 3))
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
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


# ---------------------------------------------------------------- audio /
# video: opaque binary payload + typed metadata struct, frame-sampled via
# mapInPandas. The Spark plumbing (schemas, Arrow batch iteration, per-frame
# row explosion, feature extraction incl. the REAL phash on video frames) is
# fully implemented; only the innermost codec call is a seam. No
# audio/video codec library exists in this sandbox (verified), so
# decoder=None raises NotImplementedError and the provided fake_* decoders
# are deterministic numpy doubles the offline VALUES oracle replicates
# bit-for-bit (tools/gen_value_oracles.py imports these same functions).

AUDIO_FRAMES_SCHEMA = ("media_id bigint, frame_idx int, t_ms int, "
                       "rms double, frame_sig bigint")
VIDEO_FRAMES_SCHEMA = ("media_id bigint, frame_idx int, t_ms int, "
                       "mean_luma double, phash bigint")


def fake_pcm_decode(payload: bytes, sample_rate: int, t0_ms: int,
                    n_samples: int) -> np.ndarray:
    """Deterministic codec stand-in: float64 PCM in [-1, 1) seeded from
    (crc32(payload), t0_ms). Platform-stable (PCG64)."""
    import zlib

    rng = np.random.default_rng((zlib.crc32(payload) ^ t0_ms) & 0xFFFFFFFF)
    return rng.random(n_samples) * 2.0 - 1.0


def fake_frame_decode(payload: bytes, w: int, h: int,
                      t_ms: int) -> np.ndarray:
    """Deterministic codec stand-in: (h, w, 3) uint8 frame seeded from
    (crc32(payload), t_ms)."""
    import zlib

    rng = np.random.default_rng((zlib.crc32(payload) ^ t_ms) & 0xFFFFFFFF)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def audio_frame_sample(df: DataFrame, every_ms: int = 1000,
                       decoder=None,
                       id_col: str = "media_id",
                       bytes_col: str = "payload",
                       meta_col: str = "meta") -> DataFrame:
    """Frame-sampled audio features over an opaque binary column.

    meta struct: (duration_ms int, sample_rate int). One row per sampled
    frame: rms (6 dp) and frame_sig (first 64 sample-sign bits packed into
    a long — a tiny audio fingerprint). `decoder(payload, sample_rate,
    t0_ms, n_samples) -> float64 PCM` is the codec seam: None raises
    (no audio library in this sandbox); fake_pcm_decode is the
    deterministic, oracle-replicated test double.
    """
    if decoder is None:
        raise NotImplementedError(
            "audio decoding requires a codec library not present in this "
            "environment; pass decoder=fake_pcm_decode for the "
            "deterministic test double")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, ts, rmss, sigs = [], [], [], [], []
            for mid, payload, meta in zip(
                    pdf[id_col], pdf[bytes_col], pdf[meta_col]):
                dur = int(meta["duration_ms"])
                rate = int(meta["sample_rate"])
                spf = max(1, rate * every_ms // 1000)
                for k in range(max(0, dur // every_ms)):
                    pcm = decoder(bytes(payload), rate, k * every_ms, spf)
                    # bit j of the signature = sign of sample j
                    # (little-endian): packbits replaces the per-bit loop
                    packed = np.packbits(pcm[:64] > 0, bitorder="little")
                    sig = int.from_bytes(packed.tobytes().ljust(8, b"\0"),
                                         "little", signed=True)
                    mids.append(int(mid))
                    idxs.append(k)
                    ts.append(k * every_ms)
                    rmss.append(round(float(np.sqrt((pcm * pcm).mean())), 6))
                    sigs.append(sig)
            yield pd.DataFrame({"media_id": mids, "frame_idx": idxs,
                                "t_ms": ts, "rms": rmss, "frame_sig": sigs})

    return df.mapInPandas(gen, schema=AUDIO_FRAMES_SCHEMA)


def video_frame_sample(df: DataFrame, sample_fps: float = 1.0,
                       decoder=None,
                       id_col: str = "media_id",
                       bytes_col: str = "payload",
                       meta_col: str = "meta") -> DataFrame:
    """Frame-sampled video features over an opaque binary column.

    meta struct: (duration_ms int, w int, h int). One row per sampled
    frame at `sample_fps`: mean_luma (6 dp, 0..1) and the REAL perceptual
    hash (codecs.phash64 — the same DCT phash the image store uses) of the
    decoded frame, so sampled frames feed the existing phash near-dup
    operator unchanged. `decoder(payload, w, h, t_ms) -> (h, w, 3) uint8`
    is the codec seam: None raises (no video library in this sandbox);
    fake_frame_decode is the deterministic, oracle-replicated test double.
    """
    if decoder is None:
        raise NotImplementedError(
            "video decoding requires a codec library not present in this "
            "environment; pass decoder=fake_frame_decode for the "
            "deterministic test double")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, ts, lumas, hashes = [], [], [], [], []
            for mid, payload, meta in zip(
                    pdf[id_col], pdf[bytes_col], pdf[meta_col]):
                dur = int(meta["duration_ms"])
                w, h = int(meta["w"]), int(meta["h"])
                n = int(dur / 1000.0 * sample_fps)
                for k in range(n):
                    t_ms = int(k * 1000.0 / sample_fps)
                    px = decoder(bytes(payload), w, h, t_ms)
                    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                            + 0.114 * px[:, :, 2])
                    mids.append(int(mid))
                    idxs.append(k)
                    ts.append(t_ms)
                    lumas.append(round(float(luma.mean()) / 255.0, 6))
                    hashes.append(codecs.phash64(px))
            yield pd.DataFrame({"media_id": mids, "frame_idx": idxs,
                                "t_ms": ts, "mean_luma": lumas,
                                "phash": hashes})

    return df.mapInPandas(gen, schema=VIDEO_FRAMES_SCHEMA)
