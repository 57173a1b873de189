"""Persist-lifecycle helper for candidate-pair operators.

minhash_lsh_pairs / simhash_pairs / cosine_near_dup_pairs persist() the
shared child of their self-join (broadcast build + shuffle probe sides cannot
reuse one exchange, so without the persist the expensive signature pipeline
executes twice). The persisted block lives in executor storage until
unpersisted; a long session that runs many such queries (bench.py, the
driver's 70-query gate) would otherwise accumulate storage for its lifetime.

The operators attach their persisted children to the RETURNED DataFrame;
callers release them after materializing:

    pairs = minhash_lsh_pairs(docs)
    pairs.count()        # or write/collect
    release(pairs)       # unpersists the shared signature frame

`release` is a no-op on frames with nothing attached, so callers can apply it
uniformly. bench.py additionally clearCache()s between queries so no query is
charged for a predecessor's storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_persisted_children"


def attach_persisted(out: DataFrame, *children: DataFrame) -> DataFrame:
    """Record `children` (already .persist()ed) on `out` for later release."""
    setattr(out, _ATTR, list(children))
    return out


def propagate_persisted(out: DataFrame, *srcs: DataFrame) -> DataFrame:
    """Move the persisted children attached to `srcs` onto `out` — for
    callers that derive a new frame (join/select) from an operator's output
    and return THAT: the release obligation follows the returned frame."""
    kids = [c for s in srcs for c in getattr(s, _ATTR, [])]
    for s in srcs:
        if hasattr(s, _ATTR):
            setattr(s, _ATTR, [])
    return attach_persisted(out, *kids)


def release(df: DataFrame) -> None:
    """Unpersist every persisted child attached to `df` (no-op otherwise)."""
    for child in getattr(df, _ATTR, []):
        child.unpersist()
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])
