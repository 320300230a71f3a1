"""Pure-numpy image codecs, perceptual hash, and PSNR.

No Pillow in the sandbox (SURVEY.md §7.4): images are numpy RGB arrays
encoded in three formats driven by the `fmt` column (input_hint):

  rgb8   raw header + uint8 pixels            -> exact compare
  png    real minimal PNG (zlib, filter 0)    -> lossless, exact compare
  qlossy uniform 8-step quantization          -> PSNR >= 40 dB compare

phash is a 64-bit average hash over an 8x8 block-mean downsample of the
grayscale image, packed into a signed int64 (sign bit = bit 63) so it fits
LongType. The reference has no image path at all (graft axis: payload=image);
its only hash is dead SHA-256 code at src/utils/utils.go:83-88.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_RGB8 = b"GRW1"


# ---------------------------------------------------------------- rgb8 (raw)

def encode_rgb8(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return MAGIC_RGB8 + struct.pack(">II", w, h) + px.astype(np.uint8).tobytes()


def decode_rgb8(data: bytes) -> np.ndarray:
    assert data[:4] == MAGIC_RGB8, "bad rgb8 magic"
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- png

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Minimal valid RGB8 PNG: one IDAT, scanline filter 0 everywhere."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad png magic"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up filter (tolerated though we never emit it)
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur.reshape(w, 3)
        prev = cur
    return out


# ---------------------------------------------------------------- qlossy

_QSTEP = 5  # uniform quantization step -> MSE ~ step^2/12 = 2.08 -> ~44.9 dB
#           (255/5 = 51 exactly, so the top of the range reconstructs clean)


def encode_qlossy(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = np.clip(np.round(px.astype(np.float32) / _QSTEP), 0, 255 // _QSTEP)
    return b"GRWQ" + struct.pack(">II", w, h) + q.astype(np.uint8).tobytes()


def decode_qlossy(data: bytes) -> np.ndarray:
    assert data[:4] == b"GRWQ", "bad qlossy magic"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)
    return np.clip(q.astype(np.int32) * _QSTEP, 0, 255).astype(np.uint8)


_ENCODERS = {"rgb8": encode_rgb8, "png": encode_png, "qlossy": encode_qlossy}
_DECODERS = {"rgb8": decode_rgb8, "png": decode_png, "qlossy": decode_qlossy}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](px)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


# ---------------------------------------------------------------- phash/psnr

_PHASH_W = np.array([299, 587, 114], dtype=np.int64)  # 1000x luma weights


def phash64_batch(pxs: list) -> np.ndarray:
    """Vectorized 64-bit average hash over a list of (h, w, 3) uint8 arrays.

    Same definition as `_phash64_ref` (8x8 block-mean grayscale, bit =
    cell > mean of cells) and bit-identical to it (tests/test_codecs.py
    parity test over uniform/gradient/random shapes): the 1000x-integer
    luma (299R+587G+114B, exact in int64) and exact int64 block sums make
    the scale-invariant `cell > mean` comparison insensitive to the
    summation-order rounding that a float path would reintroduce. Images
    are stacked by shape so a whole Arrow batch is a few numpy calls, not
    64 slice-means per image — ~10x per-image on the store's decode+phash
    path, which is what the rate is made of at real image sizes.

    Returns an int64 array (two's complement, fits Spark LongType).
    """
    out = np.empty(len(pxs), dtype=np.int64)
    by_shape: dict = {}
    for i, px in enumerate(pxs):
        by_shape.setdefault(px.shape, []).append(i)
    for (h, w, _), idxs in by_shape.items():
        stack = np.stack([pxs[i] for i in idxs])     # (n, h, w, 3) uint8
        g = stack @ _PHASH_W                         # (n, h, w) exact int64
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        rows = np.add.reduceat(g, ys[:-1], axis=1)
        sums = np.add.reduceat(rows, xs[:-1], axis=2)  # exact block sums
        cnt = np.diff(ys)[:, None] * np.diff(xs)[None, :]
        cells = (sums / cnt).reshape(len(idxs), 64)    # float64 block means
        bits = cells > cells.mean(axis=1)[:, None]
        packed = np.packbits(bits, axis=1)             # (n, 8) MSB-first
        out[np.asarray(idxs)] = (
            packed.view(">u8").astype(np.uint64).ravel().view(np.int64)
        )
    return out


def phash64(px: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean grayscale, bit = cell > mean.

    Returned as *signed* int64 (two's complement) to fit Spark LongType.
    Delegates to the batch implementation so scalar and batch callers can
    never diverge.
    """
    return int(phash64_batch([px])[0])


def _phash64_ref(px: np.ndarray) -> int:
    """Reference (pre-vectorization) phash: per-cell slice means in float64.
    Kept only as the parity-test witness for phash64_batch."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
