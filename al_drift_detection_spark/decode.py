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

    return joined.mapInPandas(_decode_batches, VIOLATION_SCHEMA)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _decode_batch(pdf)


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch of decode checks, VECTORIZED by image shape
    (guide §4.2 — the r7 row-at-a-time loop paid ~15 numpy-call overheads
    per row; same violation ROWS, pinned row-for-row against a row-wise
    reference implementation in tests/test_validation_e2e.py):

    - blobs decode per row (header unpack + a zero-copy frombuffer view —
      inherently per-row, cheap);
    - dims compare as one array op;
    - PSNR batches every equal-shape (ref, cur) pair group through a single
      stacked mean((A−B)², axis=(1,2)) — each row's reduction runs over the
      same contiguous block as the scalar form;
    - phash batches every equal-shape group through one stacked block-mean
      + bit-threshold + packbits(axis=1) (images smaller than the 8×8 hash
      grid fall back to the per-row edge-padding path);
    - caption equality is a per-row object compare (None semantics
      preserved exactly).
    """
    n = len(pdf)
    rows: list[tuple] = []
    parts = pdf["part"].to_numpy()
    rids = pdf["image_id"].to_numpy(dtype=object)
    w_arr = pdf["w"].to_numpy()
    h_arr = pdf["h"].to_numpy()
    ph_arr = pdf["phash"].to_numpy()
    caps = pdf["caption"].to_numpy(dtype=object)
    ref_caps = pdf["ref_caption"].to_numpy(dtype=object)
    px_list = [decode_blob(b) for b in pdf["bytes"]]
    ref_list = [decode_blob(b) for b in pdf["ref_bytes"]]

    for i in range(n):
        if px_list[i] is None:
            rows.append(
                (int(parts[i]), rids[i], "decode_ok", "bytes", "corrupt", "decodable")
            )
    ok_idx = [i for i in range(n) if px_list[i] is not None]

    # dims_match — vectorized compare of decoded vs stored dimensions
    if ok_idx:
        dh = np.fromiter((px_list[i].shape[0] for i in ok_idx), np.int64, len(ok_idx))
        dw = np.fromiter((px_list[i].shape[1] for i in ok_idx), np.int64, len(ok_idx))
        sw, sh = w_arr[ok_idx], h_arr[ok_idx]
        for j in np.flatnonzero((dw != sw) | (dh != sh)):
            i = ok_idx[int(j)]
            rows.append(
                (int(parts[i]), rids[i], "dims_match", "w,h",
                 f"({w_arr[i]},{h_arr[i]})", f"({dw[j]},{dh[j]})")
            )

    # psnr_ge_40 — stack equal-shape (ref, cur) pairs; shape mismatch is
    # psnr() = -inf, an unconditional violation (same '-infdB' rendering)
    psnr_groups: dict[tuple, list[int]] = {}
    for i in ok_idx:
        if ref_list[i] is None:
            continue
        if ref_list[i].shape != px_list[i].shape:
            rows.append(
                (int(parts[i]), rids[i], "psnr_ge_40", "bytes",
                 f"{float('-inf'):.2f}dB", f">={PSNR_MIN_DB}dB")
            )
            continue
        psnr_groups.setdefault(px_list[i].shape, []).append(i)
    for _shape, idxs in psnr_groups.items():
        a = np.stack([ref_list[i] for i in idxs])
        b = np.stack([px_list[i] for i in idxs])
        # integer-exact MSE: uint8 diffs and their squares are exact in
        # int32/int64, and float64 pairwise summation of exactly-
        # representable integers is exact too — so int-sum / size is
        # BIT-identical to mean((float64 a − b)², axis) while moving
        # int16/int32 instead of float64 (4–8× less memory traffic)
        d = a.astype(np.int16) - b
        sq = d.astype(np.int32)
        np.multiply(sq, sq, out=sq)
        mse = sq.sum(axis=(1, 2), dtype=np.int64) / (a.shape[1] * a.shape[2])
        with np.errstate(divide="ignore"):
            p = np.where(mse == 0.0, np.inf, 10.0 * np.log10(255.0**2 / mse))
        for j in np.flatnonzero(p < PSNR_MIN_DB):
            i = idxs[int(j)]
            rows.append(
                (int(parts[i]), rids[i], "psnr_ge_40", "bytes",
                 f"{p[j]:.2f}dB", f">={PSNR_MIN_DB}dB")
            )

    # phash_match — stack equal-shape groups through one block-mean +
    # threshold + packbits; sub-8×8 images use the per-row padding path
    hs = 8
    hash_groups: dict[tuple, list[int]] = {}
    for i in ok_idx:
        h, w = px_list[i].shape
        if (h // hs) == 0 or (w // hs) == 0:
            got = average_phash(px_list[i])
            if got != ph_arr[i]:
                rows.append(
                    (int(parts[i]), rids[i], "phash_match", "phash",
                     str(ph_arr[i]), str(got))
                )
        else:
            hash_groups.setdefault((h, w), []).append(i)
    for (h, w), idxs in hash_groups.items():
        th, tw = (h // hs) * hs, (w // hs) * hs
        stack = np.stack([px_list[i][:th, :tw] for i in idxs])
        # block means via exact integer sums (same bit-exactness argument
        # as the MSE above: float64 summation of uint8 values is exact)
        small = stack.reshape(len(idxs), hs, th // hs, hs, tw // hs).sum(
            axis=(2, 4), dtype=np.int64
        ) / ((th // hs) * (tw // hs))
        bits = small > small.mean(axis=(1, 2))[:, None, None]
        packed = np.packbits(bits.reshape(len(idxs), hs * hs), axis=1)
        got_arr = (
            np.ascontiguousarray(packed).view(">u8")[:, 0].astype(np.uint64).view(np.int64)
        )
        for j in np.flatnonzero(got_arr != ph_arr[idxs]):
            i = idxs[int(j)]
            rows.append(
                (int(parts[i]), rids[i], "phash_match", "phash",
                 str(ph_arr[i]), str(got_arr[j]))
            )

    # caption_match — per-row object compare (None != str, None == None)
    for i in ok_idx:
        if caps[i] != ref_caps[i]:
            rows.append(
                (int(parts[i]), rids[i], "caption_match", "caption",
                 "NULL" if caps[i] is None else str(caps[i])[:64],
                 str(ref_caps[i])[:64])
            )
    return pd.DataFrame(
        rows,
        columns=["part", "row_id", "check_name", "column", "observed", "expected"],
    ).astype({"part": np.int32})
