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

from functools import reduce
from typing import Optional

import pyarrow as pa

from ..kernel.sketch import SketchSpec, sketch_from_bytes
from .agg import SketchAgg, _update_input


def build_partials(ds, spec: SketchSpec, on: str, batch_size: Optional[int] = None):
    """Dataset of ``{partial: binary, rows: int64}`` — one row per input block
    (``batch_size=None`` maps whole blocks zero-copy)."""

    def per_block(batch: pa.Table) -> pa.Table:
        col = batch.column(on)
        if col.null_count:
            col = col.drop_null()
        sk = spec.make()
        if len(col):
            sk.update_batch(_update_input(spec.kind, col))
        return pa.table(
            {
                "partial": pa.array([sk.to_bytes()], type=pa.large_binary()),
                "rows": pa.array([len(col)], type=pa.int64()),
            }
        )

    return ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def merge_partials(partial_blobs, spec: SketchSpec):
    """Driver-side tree merge of serialized partials (associative)."""
    sketches = [sketch_from_bytes(b) for b in partial_blobs]
    if not sketches:
        return spec.make()
    return reduce(_merged, sketches)


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


def build_grouped(ds, spec: SketchSpec, on: str, key: str, finalizer=None, alias: str = "sketch"):
    """Per-group sketches via groupby-aggregate (this is a shuffle).

    Skew note (SURVEY.md §4.3.1): heavy groups (few langs / giant repos) are
    absorbed by the partial-per-block pre-aggregation that AggregateFnV2
    already performs — only one partial per (block, group) crosses the
    exchange, so hot keys ship O(num_blocks) sketches, not O(rows)."""
    return ds.groupby(key).aggregate(
        SketchAgg(spec, on=on, alias_name=alias, finalizer=finalizer)
    )
