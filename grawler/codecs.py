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

def phash64(px: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean grayscale, bit = cell > mean.

    Returned as *signed* int64 (two's complement) to fit Spark LongType.
    """
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
