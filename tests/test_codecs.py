"""Codec round-trips + the PSNR fidelity gate (BASELINE.json:2,15):
lossless formats must round-trip exactly; the lossy stand-in must stay
above 40 dB PSNR while being measurably lossy."""

from __future__ import annotations

import numpy as np
import pytest

from spark_pit import codecs


@pytest.fixture
def img():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:33, 0:21].astype(np.float64)
    base = 127.5 + 100 * np.sin(0.2 * (xx + yy))
    img = np.stack([base, base * 0.7 + 30, 255 - base], axis=2)
    img += rng.normal(0, 5, img.shape)
    return img.clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(img, fmt):
    data = codecs.encode_image(img, fmt)
    back = codecs.decode_image(data, fmt)
    assert np.array_equal(img, back)
    # and the encoded bytes are deterministic
    assert codecs.encode_image(img, fmt) == data


def test_lossy_psnr_gate(img):
    data = codecs.encode_image(img, "jpeg")
    back = codecs.decode_image(data, "jpeg")
    p = codecs.psnr(img, back)
    assert p >= 40.0, f"lossy codec below fidelity gate: {p:.1f} dB"
    assert not np.array_equal(img, back), "lossy codec must actually be lossy"


def test_psnr_identical_is_inf(img):
    assert codecs.psnr(img, img) == float("inf")


def test_odd_sizes_roundtrip():
    rng = np.random.default_rng(1)
    for w, h in [(1, 1), (2, 3), (7, 5), (64, 8)]:
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        for fmt in ("png", "bmp"):
            assert np.array_equal(codecs.decode_image(codecs.encode_image(img, fmt), fmt), img)
