"""Deterministic distributed generator for the `images` fixture table.

Shape is the authoritative input_hint schema (BASELINE.json):
(image_id string, bytes binary, w int, h int, fmt string, caption string,
 phash long) + engine keys (part int, window_id int).

Mirrors FIXTURES.md §1: seeded (42), violations planted at fixed index
strides, fmt skewed 90/10 (jpeg/png) to exercise salted repartitioning, and a
distribution shift planted in the last two windows (w/h mean ×1.5 + brighter
pixels → biased phash bits) that the KS/PSI/MMD kernels must flag.

Generation is *distributed*: `spark.range(n)` → `mapInPandas`, with a
counter-based RNG keyed by (seed, row index) so output is identical under any
partitioning — the same property that makes the table regenerable at any SF
on a real cluster without a driver-side bottleneck.

Reference parity: stands in for the reference's corpus of per-orbit CSVs
(/root/reference/util.py:37-58) as the engine's validated input; the planted
known-drift windows mirror the reference's known-drift seed groups
(/root/reference/README.md:9-49).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from al_drift_detection_spark.codec import average_phash, encode_pixels

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, part int, window_id int"
)

REF_SCHEMA = "image_id string, phash long, ref_bytes binary, ref_caption string"

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog satellite orbit plasma field "
    "magnet shock wave crossing boundary layer solar wind proton flux image "
    "caption sample data valid check drift window batch".split()
)


def _rng_for(seed: int, i: int) -> np.random.Generator:
    """Counter-based per-row RNG: identical output under any partitioning."""
    return np.random.Generator(np.random.Philox(key=seed + (i << 20)))


def _caption_for(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 12))
    return " ".join(_WORDS[rng.integers(0, len(_WORDS), n)])


def _make_row(i: int, seed: int, n_windows: int, rows_per_window: int, windows_per_part: int) -> dict:
    rng = _rng_for(seed, i)
    window_id = i // rows_per_window
    part = window_id // windows_per_part
    drifted = window_id >= max(0, n_windows - 2)

    # --- dimensions: planted shift in the last two windows (mean ×1.5) ---
    lo, hi = (24, 72) if drifted else (16, 48)
    w = int(rng.integers(lo, hi))
    h = int(rng.integers(lo, hi))

    # --- pixels: brighter in drifted windows → biased phash bits ---
    if drifted:
        pixels = rng.integers(96, 256, size=(h, w), dtype=np.uint8)
    else:
        pixels = rng.integers(0, 200, size=(h, w), dtype=np.uint8)

    fmt = "jpeg" if rng.random() < 0.9 else "png"  # 90/10 skew (FIXTURES.md)
    blob = encode_pixels(pixels, fmt)
    # phash over DECODED pixels (jpeg is lossy), so phash_match holds for
    # clean rows and fails exactly on the planted noisy-blob rows
    decoded = (pixels.astype(np.uint16) // 4 * 4).astype(np.uint8) if fmt == "jpeg" else pixels
    phash = average_phash(decoded)
    caption = _caption_for(rng)
    image_id = f"img_{i:012d}"

    row = dict(
        image_id=image_id, blob=blob, w=w, h=h, fmt=fmt, caption=caption,
        phash=phash, part=int(part), window_id=int(window_id),
        ref_blob=encode_pixels(pixels, "png"),  # lossless reference pixels
        ref_caption=caption,                     # pristine, pre-violation
        orphan=False,
    )

    # --- planted violations at fixed strides (FIXTURES.md §1) ---
    if i % 997 == 1 and i > 1:
        row["image_id"] = f"img_{i - 1:012d}"          # duplicate image_id
    if i % 811 == 3:
        row["blob"] = blob[: len(blob) // 2]            # truncated blob
    if i % 701 == 5:
        row["w"] = w + 3                                # w disagrees with decode
    if i % 703 == 7:
        row["h"] = 0                                    # non-positive h
    if i % 499 == 9:
        row["fmt"] = "bmp"                              # whitelist violation
    if i % 503 == 11:
        row["fmt"] = ""
    if i % 211 == 13:
        row["caption"] = ""                             # empty caption
    if i % 213 == 15:
        row["caption"] = None                           # null caption
    if i % 1009 == 17:
        row["phash"] = phash ^ 0x5A5A5A5A               # orphan: not in ref set
        row["orphan"] = True
    if i % 1013 == 19:
        noisy = np.clip(pixels.astype(np.int16) + rng.integers(-60, 60, pixels.shape), 0, 255)
        row["blob"] = encode_pixels(noisy.astype(np.uint8), fmt)  # PSNR<40 vs ref
    return row


def generate_images(
    spark: SparkSession,
    n_rows: int,
    rows_per_window: int = 2000,
    windows_per_part: int = 2,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed, seeded images table (input_hint schema + part/window keys)."""
    n_windows = max(1, -(-n_rows // rows_per_window))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _make_row(int(i), seed, n_windows, rows_per_window, windows_per_part)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                {
                    "image_id": [r["image_id"] for r in rows],
                    "bytes": [r["blob"] for r in rows],
                    "w": pd.array([r["w"] for r in rows], dtype="int32"),
                    "h": pd.array([r["h"] for r in rows], dtype="int32"),
                    "fmt": [r["fmt"] for r in rows],
                    "caption": [r["caption"] for r in rows],
                    "phash": pd.array([r["phash"] for r in rows], dtype="int64"),
                    "part": pd.array([r["part"] for r in rows], dtype="int32"),
                    "window_id": pd.array([r["window_id"] for r in rows], dtype="int32"),
                }
            )

    rng_df = spark.range(0, n_rows, numPartitions=num_partitions or max(4, n_windows))
    return rng_df.mapInPandas(gen, IMAGES_SCHEMA)


def generate_reference(
    spark: SparkSession,
    n_rows: int,
    rows_per_window: int = 2000,
    windows_per_part: int = 2,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reference set for referential + pixel-allclose checks (FIXTURES.md §2).

    Contains the ORIGINAL (pre-violation) phash/pixels/caption per image_id, so
    orphan-phash rows and noisy-pixel rows in `images` show up as violations.
    Broadcast-sized relative to `images` in real deployments.
    """
    n_windows = max(1, -(-n_rows // rows_per_window))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "phash": [], "ref_bytes": [], "ref_caption": []}
            for i in pdf["id"]:
                r = _make_row(int(i), seed, n_windows, rows_per_window, windows_per_part)
                if r["orphan"] or r["image_id"] != f"img_{int(i):012d}":
                    continue  # orphans/dupes are deliberately absent from ref
                out["image_id"].append(r["image_id"])
                out["phash"].append(r["phash"])
                out["ref_bytes"].append(r["ref_blob"])
                out["ref_caption"].append(r["ref_caption"])
            yield pd.DataFrame(
                {
                    "image_id": out["image_id"],
                    "phash": pd.array(out["phash"], dtype="int64"),
                    "ref_bytes": out["ref_bytes"],
                    "ref_caption": out["ref_caption"],
                }
            )

    rng_df = spark.range(0, n_rows, numPartitions=num_partitions or max(4, n_windows))
    return rng_df.mapInPandas(gen, REF_SCHEMA)
