"""Image codec / phash / PSNR invariants (input_hint: decoded-pixel allclose,
PSNR >= 40 dB for lossy formats)."""

import numpy as np
import pytest

from grawler import codecs


def _img(seed=3, h=33, w=47):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["rgb8", "png"])
def test_lossless_roundtrip_exact(fmt):
    px = _img()
    out = codecs.decode(codecs.encode(px, fmt), fmt)
    assert np.array_equal(px, out)


def test_qlossy_roundtrip_psnr():
    px = _img(seed=9, h=64, w=64)
    out = codecs.decode(codecs.encode(px, "qlossy"), "qlossy")
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0


def test_png_is_real_png():
    data = codecs.encode(_img(), "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:33] and data[-8:-4] == b"IEND"


def test_phash_deterministic_and_signed64():
    px = _img(seed=5)
    a, b = codecs.phash64(px), codecs.phash64(px.copy())
    assert a == b
    assert -(2**63) <= a < 2**63


def test_phash_robust_to_quantization():
    px = _img(seed=11, h=40, w=40)
    lossy = codecs.decode(codecs.encode(px, "qlossy"), "qlossy")
    d = bin((codecs.phash64(px) ^ codecs.phash64(lossy)) & (2**64 - 1)).count("1")
    assert d <= 4  # near-identical images -> tiny hamming distance


def test_phash_discriminates():
    a = codecs.phash64(_img(seed=1))
    b = codecs.phash64(255 - _img(seed=2))
    assert a != b
