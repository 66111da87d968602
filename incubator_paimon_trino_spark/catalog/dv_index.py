"""Deletion-vector index formats: inline JSON and executor-written shards.

Paimon stores deletion vectors as per-bucket index files maintained by the
writers and listed from the snapshot (the scan layer the reference inherits
them through is ``common/TrinoPageSourceProvider.java:85-94``). This module
is that layout for this warehouse, with two formats:

- **inline** (``index/dv-<ver>-<nonce>.json``): one JSON document
  ``{"vectors": {rel path: [positions...]}, "marks": N}`` holding every live
  mark. Kept while the cumulative mark count stays at or under the table's
  ``dv-index.inline-threshold`` (default 65536) — at that size the
  commit-time fold is a bounded driver dict and one atomic write.

- **sharded** (``index/dvm-<ver>-<nonce>.json`` manifest listing
  ``index/dv-<ver>-<nonce>-b<bucket>.json`` shard files): marks are hashed
  by data-file basename into ``dv-index.buckets`` buckets (default 16);
  each shard file is a ``{"vectors": ...}`` document for ONE bucket,
  written BY EXECUTORS (one text-write task per touched bucket), so the
  commit never materializes the live mark set on the driver — a bulk
  DELETE marking 10⁹ rows stays a Spark job end to end. A commit rewrites
  only the buckets its new marks touch and CARRIES FORWARD the other
  buckets' shard files by name (they are immutable); consumers diff two
  snapshots' indexes by comparing per-bucket shard NAMES — metadata-only —
  and read only the changed buckets' files.

Shard files deliberately reuse the inline document shape, so every reader
(the batch anti-join, the file-tail retraction stream, the resume baseline)
parses them through the ONE shared pipeline (``explode_dv_index_text``) —
the sharded index is just "many small parse tasks instead of one". The
manifest's ``dvm-`` prefix keeps it invisible to the file tail's
``dv-*.json`` glob (it carries no marks).

The threshold crossing is one-way per history: once sharded, an index stays
sharded until compaction resets it (marks only grow between compactions;
shrinking back to inline would strand a stream diff against shards it can
no longer cheaply read).
"""

from __future__ import annotations

import os
import zlib

from incubator_paimon_trino_spark.catalog.metadata import read_json

#: Table options (normalized keys — '.'/'-' → '_', like every CoreOption).
INLINE_THRESHOLD_OPT = "dv_index_inline_threshold"
BUCKETS_OPT = "dv_index_buckets"
MAX_MARKS_PER_SHARD_OPT = "dv_index_max_marks_per_shard"
DEFAULT_INLINE_THRESHOLD = 65536
DEFAULT_BUCKETS = 16
DEFAULT_MAX_MARKS_PER_SHARD = 2_000_000

#: Sharded-index manifest prefix. MUST NOT match the ``dv-*.json`` glob the
#: file-tail retraction stream tails (a manifest carries no marks).
_MANIFEST_PREFIX = "dvm-"


def is_sharded(dv_name: str | None) -> bool:
    return bool(dv_name) and dv_name.startswith(_MANIFEST_PREFIX)


def inline_threshold(options: dict) -> int:
    return int(options.get(INLINE_THRESHOLD_OPT, DEFAULT_INLINE_THRESHOLD) or 0)


def index_buckets(options: dict) -> int:
    k = int(options.get(BUCKETS_OPT, DEFAULT_BUCKETS) or DEFAULT_BUCKETS)
    if k < 1:
        raise ValueError(f"{BUCKETS_OPT} must be >= 1, got {k}")
    return k


def max_marks_per_shard(options: dict) -> int:
    """Per-shard-DOCUMENT mark ceiling: a shard aggregates into one JSON
    string, so oversized buckets split into sub-shard files at this bound
    (per-file granularity floor — one data file's marks stay together)."""
    n = int(
        options.get(MAX_MARKS_PER_SHARD_OPT, DEFAULT_MAX_MARKS_PER_SHARD)
        or DEFAULT_MAX_MARKS_PER_SHARD
    )
    if n < 1:
        raise ValueError(f"{MAX_MARKS_PER_SHARD_OPT} must be >= 1, got {n}")
    return n


def bucket_of(basename: str, k: int) -> int:
    """Shard bucket of a data-file basename. crc32 so the Python planner
    (manifest streaming source — no SparkSession) and the Spark writer
    (``F.crc32``) compute the SAME assignment."""
    return zlib.crc32(basename.encode("utf-8")) % k


def load_index_meta(tdir: str, dv_name: str | None) -> dict | None:
    """Parse an index reference into a format-tagged dict:

    - ``{"kind": "inline", "name", "marks": int|None, "vectors": {...}}``
      (marks None on legacy files written before the count was recorded)
    - ``{"kind": "sharded", "name", "marks": int, "buckets": K,
      "shards": {int bucket: [shard file names]}}``

    None when ``dv_name`` is None or the file was reaped by expiry (same
    tolerance as every other index reader). Inline parse is O(index), which
    the inline threshold bounds; a sharded manifest is O(buckets)."""
    if not dv_name:
        return None
    path = os.path.join(tdir, "index", dv_name)
    try:
        doc = read_json(path)
    except FileNotFoundError:
        return None
    if is_sharded(dv_name):
        if doc.get("format") != "sharded":
            raise ValueError(f"unreadable DV index manifest: {dv_name}")
        return {
            "kind": "sharded",
            "name": dv_name,
            "marks": int(doc["marks"]),
            "buckets": int(doc["buckets"]),
            "shards": {int(b): list(names) for b, names in doc["shards"].items()},
        }
    vecs = doc.get("vectors")
    if vecs is None:
        raise ValueError(f"unreadable DV index: {dv_name}")
    marks = doc.get("marks")
    return {
        "kind": "inline",
        "name": dv_name,
        "marks": int(marks) if marks is not None else None,
        "vectors": vecs,
    }


def mark_file_names(tdir: str, dv_name: str | None) -> list[str]:
    """Names (under ``index/``) of the files that CARRY MARKS for this
    index reference: the inline file itself, or a sharded manifest's shard
    files. [] when absent/reaped. Every reader resolves through this, so
    no path can disagree about where marks live."""
    meta = load_index_meta(tdir, dv_name)
    if meta is None:
        return []
    if meta["kind"] == "inline":
        return [meta["name"]]
    return [n for names in meta["shards"].values() for n in names]


def index_file_names(tdir: str, dv_name: str | None) -> list[str]:
    """ALL files belonging to this index reference (manifest + shards) —
    the unit branch copies and GC liveness track."""
    if not dv_name:
        return []
    names = mark_file_names(tdir, dv_name)
    if is_sharded(dv_name):
        names = [dv_name] + names
    return names


def copy_index_files(src_tdir: str, dst_tdir: str, dv_name: str) -> None:
    """Copy one snapshot's DV index (manifest + shards, or the inline
    file) between table namespaces — branch seeding and fast-forward
    grafts. Names are preserved (apply matches on basenames); files already
    present at the destination are kept (shards shared across grafted
    snapshots copy once)."""
    import shutil

    os.makedirs(os.path.join(dst_tdir, "index"), exist_ok=True)
    for n in dict.fromkeys(index_file_names(src_tdir, dv_name) + [dv_name]):
        src = os.path.join(src_tdir, "index", n)
        dst = os.path.join(dst_tdir, "index", n)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy2(src, dst)
