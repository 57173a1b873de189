from __future__ import annotations

import numpy as np
import pytest

from al_drift_detection_spark.codec import (
    average_phash,
    blob_dims,
    decode_blob,
    encode_pixels,
    hamming64,
    psnr,
)

RNG = np.random.default_rng(7)


def test_png_roundtrip_lossless():
    px = RNG.integers(0, 256, (20, 30), dtype=np.uint8)
    out = decode_blob(encode_pixels(px, "png"))
    assert np.array_equal(out, px)
    assert psnr(px, out) == float("inf")


def test_jpeg_lossy_but_high_psnr():
    px = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    out = decode_blob(encode_pixels(px, "jpeg"))
    p = psnr(px, out)
    assert 40.0 < p < 60.0  # quantize-to-4 ≈ 42.7dB vs original: clears the bar
    assert psnr(out, out) == float("inf")


def test_truncated_and_garbage_blobs():
    px = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_pixels(px, "png")
    assert decode_blob(blob[: len(blob) // 2]) is None
    assert decode_blob(b"NOTAFORMAT" + blob) is None
    assert decode_blob(None) is None
    assert blob_dims(blob) == (16, 16)


def test_phash_stability_and_sensitivity():
    px = RNG.integers(0, 256, (40, 40), dtype=np.uint8)
    h1 = average_phash(px)
    h2 = average_phash(px.copy())
    assert h1 == h2
    assert isinstance(h1, int)
    # small noise → small hamming distance; inversion → large
    noisy = np.clip(px.astype(np.int16) + RNG.integers(-5, 5, px.shape), 0, 255).astype(np.uint8)
    inverted = (255 - px).astype(np.uint8)
    assert hamming64(h1, average_phash(noisy)) <= 10
    assert hamming64(h1, average_phash(inverted)) >= 40


def test_phash_tiny_image():
    px = RNG.integers(0, 256, (3, 5), dtype=np.uint8)
    assert isinstance(average_phash(px), int)


def test_psnr_shape_mismatch():
    a = np.zeros((4, 4), dtype=np.uint8)
    b = np.zeros((4, 5), dtype=np.uint8)
    assert psnr(a, b) == float("-inf")
