"""Image-bytes validation: decode, dimension, PSNR, phash, caption checks.

Implements the target-only operator F9 (SURVEY.md §2.9) mandated by the
input_hint: per-row invariants vs the reference set — decoded-pixel allclose
(PSNR ≥ 40 dB for lossy codecs) + exact caption equality + phash recompute.

Plan shape (scale notes):
- `images ⋈ ref` on image_id: the ref side carries pixel payloads so it is
  NOT broadcastable — Catalyst picks a sort-merge join; on a real deployment
  both tables are bucketed by image_id so the join is shuffle-free;
- the joined stream flows through ONE `mapInPandas` (iterator-of-Arrow-batch)
  pass: decode amortizes per batch, no per-row Python UDFs (input_hint);
- output is failures only → tiny; passing rows never leave the executor.

The codec is the deterministic stand-in from codec.py (no imaging lib in this
container); the plumbing is identical for a PIL-backed decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from al_drift_detection_spark.codec import average_phash, decode_blob, psnr

VIOLATION_SCHEMA = (
    "part int, row_id string, check_name string, column string, "
    "observed string, expected string"
)

PSNR_MIN_DB = 40.0


def decode_checks(images: DataFrame, ref: DataFrame) -> DataFrame:
    """Decode-path violations for every image that joins a reference row.

    Checks emitted (failures only):
      decode_ok      — bytes parse into pixels
      dims_match     — stored (w, h) equal decoded dimensions
      psnr_ge_40     — decoded pixels vs reference pixels ≥ 40 dB (lossy)
      phash_match    — stored phash equals recomputed phash of decoded pixels
      caption_match  — caption exactly equals reference caption
    """
    joined = images.select(
        "part", "image_id", "bytes", "w", "h", "caption", "phash"
    ).join(
        ref.select("image_id", "ref_bytes", "ref_caption"),
        "image_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for t in pdf.itertuples(index=False):
                part, rid = int(t.part), t.image_id
                px = decode_blob(t.bytes)
                if px is None:
                    rows.append((part, rid, "decode_ok", "bytes", "corrupt", "decodable"))
                    continue
                dh, dw = px.shape
                if dw != t.w or dh != t.h:
                    rows.append(
                        (part, rid, "dims_match", "w,h", f"({t.w},{t.h})", f"({dw},{dh})")
                    )
                ref_px = decode_blob(t.ref_bytes)
                if ref_px is not None:
                    p = psnr(ref_px, px)
                    if p < PSNR_MIN_DB:
                        rows.append(
                            (part, rid, "psnr_ge_40", "bytes", f"{p:.2f}dB", f">={PSNR_MIN_DB}dB")
                        )
                got_hash = average_phash(px)
                if got_hash != t.phash:
                    rows.append(
                        (part, rid, "phash_match", "phash", str(t.phash), str(got_hash))
                    )
                if t.caption != t.ref_caption:
                    rows.append(
                        (
                            part, rid, "caption_match", "caption",
                            "NULL" if t.caption is None else str(t.caption)[:64],
                            str(t.ref_caption)[:64],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["part", "row_id", "check_name", "column", "observed", "expected"],
            ).astype({"part": np.int32})

    return joined.mapInPandas(run, VIOLATION_SCHEMA)
