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


def test_phash_batch_matches_reference():
    """phash64_batch is bit-identical to the pre-vectorization per-cell
    slice-mean reference across shapes and adversarial content (uniform
    images are all-tie cells; gradients produce near-tie cells)."""
    rng = np.random.default_rng(42)
    imgs = [
        np.full((16, 16, 3), 127, dtype=np.uint8),          # exact ties
        np.full((13, 9, 3), 200, dtype=np.uint8),           # ragged blocks
        np.tile((np.arange(24, dtype=np.uint8) * 10)[:, None, None],
                (1, 24, 3)),                                # gradient
    ]
    for _ in range(200):
        h, w = rng.integers(8, 49, 2)
        imgs.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    batch = codecs.phash64_batch(imgs)
    for px, got in zip(imgs, batch):
        assert int(got) == codecs._phash64_ref(px)
        assert codecs.phash64(px) == int(got)  # scalar delegates to batch
