"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched mapInPandas passes.

The Spark-side plumbing (schemas, batch iteration, partitioning, UDF
signatures) is real and tested. Decoders, by modality:

- image: codec.py's deterministic container codec end-to-end (decode →
  features → resize → phash), with a live PIL fallthrough seam;
- audio: decode_audio is a REAL PCM-WAV decoder (stdlib wave + numpy — no
  external lib needed) feeding the audio_features mapInPandas pass; a
  soundfile/librosa drop-in extends it to compressed formats;
- video: frame sampling remains a deterministic stand-in (no
  pyav/ffmpeg in this container) — the dataflow (1 row → N frame rows) is
  real and tested.
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


def decode_audio(blob: bytes) -> tuple[np.ndarray, int] | None:
    """REAL audio decode for PCM WAV containers — stdlib `wave` + numpy, no
    external audio library needed (the seam a soundfile/librosa-backed
    implementation extends to compressed formats). Returns (mono float64
    waveform in [-1, 1], sample_rate); non-WAV / corrupt / unsupported-width
    blobs return None (the same None-on-corrupt contract as
    codec.decode_blob, so the violation accounting is uniform across
    modalities). Multi-channel audio is downmixed by channel mean."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if sr <= 0 or nch <= 0:
        return None
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x, sr


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, ok boolean, sample_rate int, n_samples long, "
    "duration_s double, rms double, zcr double, spectral_centroid double"
)

# per-row FFT bound: features are computed on the first _AUDIO_FFT_CAP mono
# samples (~1.5 s at 44.1 kHz) so per-row cost is O(cap log cap) regardless
# of clip length — the duration/n_samples fields still report the full clip
_AUDIO_FFT_CAP = 1 << 16


def audio_features(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "audio_id"
) -> DataFrame:
    """Decode + per-clip audio features per Arrow batch (mapInPandas —
    Python only at the modality edge, brief §multimodal): duration, RMS
    level, zero-crossing rate, and spectral centroid (numpy rfft on a
    bounded prefix). Undecodable blobs → ok=false row with NULL features,
    mirroring image_features' contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                dec = decode_audio(blob) if blob is not None else None
                if dec is None or len(dec[0]) == 0:
                    rows.append((rid, False, None, None, None, None, None, None))
                    continue
                x, sr = dec
                head = x[:_AUDIO_FFT_CAP]
                rms = float(np.sqrt(np.mean(head * head)))
                zcr = float(np.mean(np.signbit(head[1:]) != np.signbit(head[:-1])))
                mag = np.abs(np.fft.rfft(head))
                freqs = np.fft.rfftfreq(len(head), d=1.0 / sr)
                tot = float(mag.sum())
                centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                rows.append(
                    (rid, True, int(sr), len(x), len(x) / sr, rms, zcr, centroid)
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "ok", "sample_rate", "n_samples",
                         "duration_s", "rms", "zcr", "spectral_centroid"],
            )

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def decode_audio_stub(blob: bytes) -> np.ndarray:
    """Deterministic pseudo-waveform for NON-WAV blobs (kept for the
    plumbing tests that predate the real decoder): derives a short waveform
    from the byte content. Real WAV containers go through decode_audio."""
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
