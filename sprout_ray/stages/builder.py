"""Sketch build strategies over a Ray Dataset.

Two physical plans for the same logical build (SURVEY.md §3.5):

- ``mode="agg"`` — ``ds.aggregate(SketchAgg(...))``: Ray executes
  partial-per-block + hierarchical combine inside its aggregation machinery.
- ``mode="partials"`` — a streaming ``map_batches`` stage emits ONE serialized
  partial sketch row per input block (so partial count == block count, not
  row count), and the driver tree-merges the tiny partials dataset. This
  plan avoids the aggregate shuffle entirely (legal because sketch merge is
  commutative/associative — ordering is irrelevant, SURVEY.md §4.3.5) and is
  the scale path: at 256 nodes it moves `num_blocks × sketch_size` bytes,
  never row data.

Both return the finalized sketch object. Equality of the two plans' results
is asserted in tests (order-insensitivity evidence).
"""

from __future__ import annotations

import zlib
from functools import reduce
from typing import Optional

import pyarrow as pa

from ..kernel.sketch import SketchSpec, sketch_from_bytes
from .agg import SketchAgg, _update_input


def pack_partial(buf: bytes) -> bytes:
    """Wire format for serialized partials: low-fill bitmaps/registers are
    mostly zeros, so cheap zlib-1 cuts partial shipping severalfold. A
    256 KB probe skips compression for high-entropy payloads (sparse bloom
    index dumps are near-random integers — zlib would burn CPU for ~0%)."""
    if len(buf) > 262_144:
        probe = zlib.compress(buf[:262_144], 1)
        # sparse index dumps probe ~0.75 (only the top byte is sparse);
        # dense low-fill bitmaps/registers probe <= ~0.3 — the 0.7 cut keeps
        # zlib for the latter and skips its CPU for the former
        if len(probe) > 0.7 * 262_144:
            return b"R0" + buf
    return b"Z1" + zlib.compress(buf, 1)


def unpack_partial(buf: bytes) -> bytes:
    if buf[:2] == b"Z1":
        return zlib.decompress(buf[2:])
    if buf[:2] == b"R0":
        return bytes(buf[2:])
    return bytes(buf)


# Update chunk: temporaries for a 32k-row hash pass stay ~2-3 MB — under the
# 32 MiB glibc mmap threshold, so heap pages are REUSED across chunks instead
# of mmap/munmap-churning (this VM class spends >90% CPU in the kernel when
# 32 workers fault fresh multi-10MB buffers concurrently).
UPDATE_CHUNK = 32_768


def update_chunked(sk, kind: str, col) -> None:
    """Feed an Arrow column to a sketch in allocator-friendly chunks.

    Key (string/binary) columns additionally split on the padded-matrix
    byte budget: one multi-MB outlier key in a 32k-row chunk would densify
    the whole chunk to its width (tens of GB); length-bucketed spans keep
    every matrix under MAX_MATRIX_BYTES while preserving row order."""
    from ..kernel.murmur3 import byte_lengths, length_bucketed_spans
    from .agg import _NUMERIC_KINDS, _RAW_KINDS

    if kind in _NUMERIC_KINDS or kind in _RAW_KINDS:
        # float64 (tdigest/kll) and column-native (fd/moments) inputs:
        # no key canonicalization, no padded-matrix budget
        for off in range(0, len(col), UPDATE_CHUNK):
            sk.update_batch(_update_input(kind, col.slice(off, UPDATE_CHUNK)))
        return
    prepped = _update_input(kind, col)  # casts non-string types to string
    lengths = byte_lengths(prepped)
    for start, end in length_bucketed_spans(lengths, max_rows=UPDATE_CHUNK):
        sk.update_batch(prepped.slice(start, end - start))


def build_partials(ds, spec: SketchSpec, on: str, batch_size: Optional[int] = None):
    """Dataset of ``{partial: binary, rows: int64}`` — one row per input block
    (``batch_size=None`` maps whole blocks zero-copy)."""

    def per_block(batch: pa.Table) -> pa.Table:
        col = batch.column(on)
        if col.null_count:
            col = col.drop_null()
        sk = spec.make()
        if len(col):
            update_chunked(sk, spec.kind, col)
        return pa.table(
            {
                "partial": pa.array([pack_partial(sk.to_bytes())], type=pa.large_binary()),
                "rows": pa.array([len(col)], type=pa.int64()),
            }
        )

    return ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def merge_partials(partial_blobs, spec: SketchSpec):
    """Tree merge of serialized partials (associative).

    Small partial sets merge on the driver; larger sets merge as a binary
    tree of Ray tasks so the reduce is O(log n) levels of parallel work
    instead of a serial driver loop (the shape that matters at 256 nodes)."""
    blobs = list(partial_blobs)
    if not blobs:
        return spec.make()
    if len(blobs) > 64:
        return sketch_from_bytes(unpack_partial(_tree_merge_remote(blobs)))
    acc = sketch_from_bytes(unpack_partial(blobs[0]))
    if hasattr(acc, "merge_bytes"):
        # stream-OR the raw buffers: no per-partial materialization
        for b in blobs[1:]:
            acc.merge_bytes(unpack_partial(b))
        return acc
    return reduce(
        _merged, (sketch_from_bytes(unpack_partial(b)) for b in blobs[1:]), acc
    )


def _merge_pair_blobs(a: bytes, b: bytes) -> bytes:
    sa = sketch_from_bytes(unpack_partial(a))
    sb = sketch_from_bytes(unpack_partial(b))
    sa.merge(sb)
    # intermediates stay raw: they never leave the object store, and zlib on
    # the increasingly dense upper-level bitmaps would dominate the merge
    return sa.to_bytes()


def _tree_merge_remote(blobs: list) -> bytes:
    import ray

    merge_task = ray.remote(num_cpus=1)(_merge_pair_blobs)
    refs = [ray.put(b) for b in blobs]
    while len(refs) > 1:
        nxt = []
        for i in range(0, len(refs) - 1, 2):
            nxt.append(merge_task.remote(refs[i], refs[i + 1]))
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return ray.get(refs[0])


def _merged(a, b):
    a.merge(b)
    return a


def build_sketch(ds, spec: SketchSpec, on: str, mode: str = "partials"):
    """Build one global sketch over ``ds[on]``; returns the sketch object."""
    if mode == "agg":
        name = f"{spec.kind}({on})"
        res = ds.aggregate(SketchAgg(spec, on=on, alias_name=name))
        return sketch_from_bytes(res[name])
    if mode == "partials":
        parts = build_partials(ds, spec, on)
        blobs = [r["partial"] for r in parts.take_all()]
        return merge_partials(blobs, spec)
    raise ValueError(f"unknown build mode {mode!r}")


def build_grouped_salted(
    ds,
    spec: SketchSpec,
    on: str,
    key: str,
    salt: int = 8,
    finalizer=None,
    alias: str = "sketch",
):
    """Per-group sketches with key salting for hot groups (SURVEY.md §4.3.1).

    A heavy group (one lang dominating, a giant repo) funnels all its partials
    through ONE reducer in a plain groupby. Salting splits each group into
    ``salt`` shards (deterministic row-hash), aggregates per (key, shard) so
    reducers parallelize, then bit-OR-merges the shards per key — legal
    because every sketch merge is associative/commutative.
    """
    import numpy as np

    from ..kernel.murmur3 import murmur_hash_column

    def add_salt(batch: pa.Table) -> pa.Table:
        h = murmur_hash_column(batch.column(on), seed=7)
        return batch.append_column(
            "_salt", pa.array((h % np.uint64(salt)).view(np.int64))
        )

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    per_shard = salted.groupby([key, "_salt"]).aggregate(
        SketchAgg(spec, on=on, alias_name=alias)
    )
    rows = per_shard.take_all()  # one small serialized sketch per (key, shard)
    merged: dict = {}
    for r in rows:
        sk = sketch_from_bytes(r[alias])
        if r[key] in merged:
            merged[r[key]].merge(sk)
        else:
            merged[r[key]] = sk
    out = {
        key: list(merged.keys()),
        alias: [
            (finalizer(s) if finalizer else s.to_bytes()) for s in merged.values()
        ],
    }
    return pa.table(out)


def build_grouped(ds, spec: SketchSpec, on: str, key: str, finalizer=None, alias: str = "sketch"):
    """Per-group sketches via groupby-aggregate (this is a shuffle).

    Skew note (SURVEY.md §4.3.1): heavy groups (few langs / giant repos) are
    absorbed by the partial-per-block pre-aggregation that AggregateFnV2
    already performs — only one partial per (block, group) crosses the
    exchange, so hot keys ship O(num_blocks) sketches, not O(rows)."""
    return ds.groupby(key).aggregate(
        SketchAgg(spec, on=on, alias_name=alias, finalizer=finalizer)
    )
