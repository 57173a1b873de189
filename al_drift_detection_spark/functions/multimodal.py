"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched mapInPandas passes.

The Spark-side plumbing (schemas, batch iteration, partitioning, UDF
signatures) is real and tested; the media decode itself is STUBBED because
this container has no imaging/audio libraries (PIL/cv2/librosa) — each stub
is a deterministic fake behind an import-try so a real library drops in
without touching the dataflow. The image path uses the real fake-codec from
codec.py end-to-end (decode → features → resize → phash).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from al_drift_detection_spark.codec import HAVE_PIL, average_phash, decode_blob

IMAGE_FEATURES_SCHEMA = (
    "image_id string, ok boolean, width int, height int, mean_px double, "
    "std_px double, phash long"
)

RESIZE_SCHEMA = "image_id string, thumb binary, thumb_w int, thumb_h int"

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame binary"


def image_features(df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """Decode + per-image feature extraction (mean/std/phash) per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "ok", "width", "height", "mean_px", "std_px", "phash")}
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                px = decode_blob(blob)
                out["image_id"].append(rid)
                if px is None:
                    out["ok"].append(False)
                    for k in ("width", "height", "mean_px", "std_px", "phash"):
                        out[k].append(None)
                else:
                    out["ok"].append(True)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["mean_px"].append(float(px.mean()))
                    out["std_px"].append(float(px.std()))
                    out["phash"].append(average_phash(px))
            pdf_out = pd.DataFrame(out)
            # nullable Int64: a plain list with Nones becomes float64 and
            # silently loses int64 precision above 2^53 (phash is 64-bit)
            pdf_out["phash"] = pd.array(out["phash"], dtype="Int64")
            yield pdf_out

    return df.select(id_col, bytes_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, target: int = 8, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Block-mean thumbnail per image (the resize kernel a PIL-backed
    implementation would replace with Image.resize)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                px = decode_blob(blob)
                if px is None:
                    rows.append((rid, None, None, None))
                    continue
                h, w = px.shape
                th, tw = max(1, h // target * target), max(1, w // target * target)
                if h >= target and w >= target:
                    small = (
                        px[: h // target * target, : w // target * target]
                        .reshape(target, h // target, target, w // target)
                        .mean(axis=(1, 3))
                        .astype(np.uint8)
                    )
                else:
                    small = px[:target, :target]
                rows.append((rid, small.tobytes(), small.shape[1], small.shape[0]))
            yield pd.DataFrame(rows, columns=["image_id", "thumb", "thumb_w", "thumb_h"])

    return df.select(id_col, bytes_col).mapInPandas(run, RESIZE_SCHEMA)


def decode_audio_stub(blob: bytes) -> np.ndarray:
    """STUB — no audio library in this container. A real implementation
    (e.g. soundfile/librosa) returns a waveform array; the deterministic fake
    derives a short pseudo-waveform from the byte content so downstream
    plumbing (batch shapes, schemas) is exercised."""
    if HAVE_PIL:  # placeholder condition: no audio lib exists either way
        raise NotImplementedError("wire a real audio decoder here")
    arr = np.frombuffer(blob[:1024], dtype=np.uint8).astype(np.float32)
    return (arr - 128.0) / 128.0


def sample_video_frames_stub(blob: bytes, every: int = 4, max_frames: int = 8) -> list[bytes]:
    """STUB frame sampler — a real implementation uses pyav/ffmpeg. The fake
    treats the blob as a concatenation of fixed-size 'frames' and strides."""
    frame_size = 256
    frames = [blob[i : i + frame_size] for i in range(0, len(blob), frame_size * every)]
    return frames[:max_frames]


def video_frame_sample(df: DataFrame, bytes_col: str = "bytes", id_col: str = "media_id") -> DataFrame:
    """Frame-sampling dataflow: one media row in → N frame rows out, batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                for i, fr in enumerate(sample_video_frames_stub(bytes(blob))):
                    rows.append((rid, i, fr))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select(id_col, bytes_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
