"""Retention/compaction for the persisted snapshot stores (VERDICT r6 Next
#3): the incremental stores — signature generations (functions/dedup.py),
HLL snapshots (functions/sketches.py), histogram snapshots
(functions/histograms.py), metrics runs (functions/anomaly.py) — grow
monotonically, O(snapshots × windows) rows; years of daily ingests make
every read's snapshot union linearly slower. The reference keeps its own
state bounded (majority eviction, gan.py:400-413 — SURVEY §2.8 M2); this
module is the store-layer analog.

Mechanism — the generation-commit pattern already proven by the signature
store, applied to compaction: a compaction MERGES all snapshots ≤ a cutoff
into one directory (`_compacted_<cutoff>/`), then makes it visible with a
single atomically-renamed marker (`_compact_<cutoff>.committed`). Readers
resolve the HIGHEST committed cutoff and read (merged dir) ∪ (live
snapshots > cutoff) — so a crash ANYWHERE inside compaction leaves the
store logically unchanged: before the marker rename the merged dir is
invisible; after it, the stale snapshot directories are ignored and the
best-effort vacuum that deletes them can crash or be skipped with no effect
on answers. Merges are lossless by each store's own algebra (HLL register
union, histogram count sums, signature-row set union), so answers are
IDENTICAL before and after — pinned per store in tests/test_store_compaction.py.

At deployment these stores are Iceberg tables and this operation is
`rewrite_data_files` + `expire_snapshots`; the marker protocol reproduces
the snapshot-swap atomicity on plain POSIX directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACT_MARKER = "_compact_"


def max_committed_level(store_path: str, prefix: str = COMPACT_MARKER) -> int | None:
    """Highest committed marker level, or None. Markers are
    `{prefix}{level}.committed` files at the store root."""
    if not os.path.isdir(store_path):
        return None
    lv = [
        int(f[len(prefix):-len(".committed")])
        for f in os.listdir(store_path)
        if f.startswith(prefix) and f.endswith(".committed")
    ]
    return max(lv) if lv else None


def commit_level(store_path: str, level: int, prefix: str = COMPACT_MARKER) -> None:
    """Atomically publish a compaction level: the single os.replace is the
    commit point (the signature store's marker rename)."""
    tmp = os.path.join(store_path, f".{prefix}{level}.tmp")
    open(tmp, "w").close()
    os.replace(tmp, os.path.join(store_path, f"{prefix}{level}.committed"))


def _compacted_dir(store_path: str, level: int) -> str:
    return os.path.join(store_path, f"_compacted_{level}")


def allocate_snapshot_id(store_path: str, run_key: str) -> int:
    """MONOTONIC snapshot-id allocation keyed by run id — the precondition
    the compaction cutoff rests on (live snapshots are exactly those ABOVE
    the cutoff, so a later ingest must never receive a smaller id than an
    earlier one; a raw hash of the run id, the store's previous scheme,
    breaks that).

    Replay contract: a run_key seen before returns its ORIGINAL id — a
    crash-retried ingest dynamic-overwrites its own partition exactly as
    before, and a replay of a run whose snapshot was already compacted
    writes below the cutoff where the reader ignores it (it is already
    counted inside the merged rows — the correct no-op). A new run_key gets
    max(assigned, live, cutoff) + 1. Assignment markers are tiny
    `_snapid_<crc32>_<id>.committed` files, atomically renamed, never
    vacuumed (O(runs) inodes); run keys are matched by crc32, the same
    collision posture as the previous hash-keyed scheme."""
    import zlib

    os.makedirs(store_path, exist_ok=True)
    crc = zlib.crc32(run_key.encode())
    pref = "_snapid_"
    assigned: dict[int, int] = {}
    for f in os.listdir(store_path):
        if f.startswith(pref) and f.endswith(".committed"):
            c, i = f[len(pref):-len(".committed")].rsplit("_", 1)
            assigned[int(c)] = int(i)
    if crc in assigned:
        return assigned[crc]
    lvl = max_committed_level(store_path)
    floor = max(
        max(assigned.values(), default=-1),
        lvl if lvl is not None else -1,
        max(
            (int(d.split("=", 1)[1]) for d in os.listdir(store_path)
             if "=" in d and not d.startswith((".", "_snapid_"))
             and d.split("=", 1)[1].lstrip("-").isdigit()),
            default=-1,
        ),
    )
    nid = floor + 1
    tmp = os.path.join(store_path, f".{pref}{crc}_{nid}.tmp")
    open(tmp, "w").close()
    os.replace(tmp, os.path.join(store_path, f"{pref}{crc}_{nid}.committed"))
    return nid


def _live_snapshots(store_path: str, part_col: str, floor: int) -> list[int]:
    if not os.path.isdir(store_path):
        return []
    out = []
    for d in os.listdir(store_path):
        if d.startswith(part_col + "="):
            s = int(d.split("=", 1)[1])
            if s > floor:
                out.append(s)
    return sorted(out)


def read_snapshot_store(
    spark: SparkSession,
    store_path: str,
    part_col: str = "_snapshot",
    schema: str | None = None,
) -> DataFrame | None:
    """The store's COMMITTED view: merged rows of every snapshot ≤ the
    highest committed compaction cutoff, plus the live snapshots above it.
    Stale pre-compaction directories (vacuum skipped or crashed) are
    ignored by construction. Returns None for a store with no data."""
    lvl = max_committed_level(store_path)
    floor = -1 if lvl is None else lvl
    live = _live_snapshots(store_path, part_col, floor)

    def rd(base: str, paths: list[str]) -> DataFrame:
        r = spark.read.schema(schema) if schema else spark.read
        return r.option("basePath", base).parquet(*paths)

    frames = []
    if lvl is not None:
        cdir = _compacted_dir(store_path, lvl)
        frames.append(rd(cdir, [os.path.join(cdir, f"{part_col}={lvl}")]))
    if live:
        frames.append(
            rd(store_path, [os.path.join(store_path, f"{part_col}={s}") for s in live])
        )
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def compact_snapshot_store(
    spark: SparkSession,
    store_path: str,
    merge_fn,
    keep_last: int = 1,
    part_col: str = "_snapshot",
    schema: str | None = None,
) -> int | None:
    """Merge every snapshot except the newest `keep_last` into one directory
    at the merge set's highest snapshot id (the new cutoff); commit with the
    atomic marker; then best-effort vacuum. `merge_fn` maps the merge set's
    rows (WITHOUT part_col) to the merged rows — it must be the store's
    lossless merge so answers are identical before/after.

    Returns the new cutoff level, or None when there was nothing to compact
    (fewer than two mergeable units). Idempotent and crash-safe at every
    step (module docstring); re-running after any crash converges."""
    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0, got {keep_last}")
    lvl = max_committed_level(store_path)
    floor = -1 if lvl is None else lvl
    live = _live_snapshots(store_path, part_col, floor)
    units: list[int] = ([lvl] if lvl is not None else []) + live
    to_merge = units[: max(len(units) - keep_last, 0)]
    if len(to_merge) < 2:
        return None
    cutoff = to_merge[-1]

    def rd(base: str, paths: list[str]) -> DataFrame:
        r = spark.read.schema(schema) if schema else spark.read
        return r.option("basePath", base).parquet(*paths)

    parts = []
    if lvl is not None:
        cdir = _compacted_dir(store_path, lvl)
        parts.append(rd(cdir, [os.path.join(cdir, f"{part_col}={lvl}")]))
    live_merge = [s for s in live if s <= cutoff]
    if live_merge:
        parts.append(
            rd(store_path,
               [os.path.join(store_path, f"{part_col}={s}") for s in live_merge])
        )
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)

    merged = merge_fn(rows.drop(part_col))
    # leaf-dir write WITHOUT the partition column — the reader's basePath
    # re-derives it from the `{part_col}=<cutoff>` path component
    merged.write.mode("overwrite").parquet(
        os.path.join(_compacted_dir(store_path, cutoff), f"{part_col}={cutoff}")
    )
    commit_level(store_path, cutoff)
    vacuum_snapshot_store(store_path, part_col)
    return cutoff


def vacuum_snapshot_store(store_path: str, part_col: str = "_snapshot") -> int:
    """Best-effort removal of directories/markers made unreachable by the
    highest committed cutoff: live snapshot dirs ≤ cutoff, older compacted
    dirs, older markers. Crash-safe because readers never look at them;
    returns the number of entries removed."""
    import shutil

    lvl = max_committed_level(store_path)
    if lvl is None:
        return 0
    removed = 0
    for d in list(os.listdir(store_path)):
        p = os.path.join(store_path, d)
        if d.startswith(part_col + "=") and int(d.split("=", 1)[1]) <= lvl:
            shutil.rmtree(p, ignore_errors=True)
            removed += 1
        elif d.startswith("_compacted_") and int(d.rsplit("_", 1)[1]) < lvl:
            shutil.rmtree(p, ignore_errors=True)
            removed += 1
        elif (
            d.startswith(COMPACT_MARKER)
            and d.endswith(".committed")
            and int(d[len(COMPACT_MARKER):-len(".committed")]) < lvl
        ):
            os.remove(p)
            removed += 1
    return removed
