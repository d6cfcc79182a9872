"""Membership probing / Bloom-guarded lookups as Ray Data stages.

Generalizes the reference's filter-as-cache-guard pattern
(``BloomFilter.Get``, /root/reference/bloom.go:220-236: Contains first, hit
the store only on maybe) to datasets: the built filter is broadcast ONCE via
``ray.put`` and read in every actor's ``__init__`` — never re-shipped per
batch — then used to prune the probe side of a join/lookup before any
shuffle (classic Bloom semi-join pruning).

No false negatives (bloom.go:200-217): ``mode="maybe"`` keeps a superset of
true matches; ``mode="definitely-not"`` keeps only rows provably absent.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..kernel.sketch import sketch_from_bytes


def broadcast_sketch(sketch) -> "ray.ObjectRef":
    """Put a serialized sketch in the object store once (driver side)."""
    return ray.put(sketch.to_bytes())


class BloomProbe:
    """Actor-pool map_batches stage: annotate or filter by membership.

    The filter is deserialized once per actor in ``__init__`` (stateful-stage
    pattern); ``__call__`` is a vectorized probe per Arrow batch.
    """

    def __init__(
        self,
        sketch_ref: "ray.ObjectRef",
        on: str,
        mode: str = "maybe",
        flag_column: Optional[str] = None,
    ):
        self.filter = sketch_from_bytes(ray.get(sketch_ref))
        self.on = on
        if mode not in ("maybe", "definitely-not"):
            raise ValueError(f"unknown probe mode {mode!r}")
        self.mode = mode
        self.flag_column = flag_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.on)
        if not (
            pa.types.is_string(col.type)
            or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)
        ):
            col = col.cast(pa.string())
        # probe in length-bucketed spans so one huge key can't densify the
        # whole batch's padded key matrix (see murmur3.length_bucketed_spans)
        from ..kernel.murmur3 import byte_lengths, length_bucketed_spans

        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lengths = byte_lengths(col)
        maybe = np.empty(len(col), dtype=bool)
        for start, end in length_bucketed_spans(lengths):
            maybe[start:end] = self.filter.contains_batch(col.slice(start, end - start))
        if self.flag_column is not None:
            return batch.append_column(self.flag_column, pa.array(maybe))
        mask = maybe if self.mode == "maybe" else ~maybe
        return batch.filter(pa.array(mask))


def probe_filter(
    ds,
    sketch,
    on: str,
    mode: str = "maybe",
    flag_column: Optional[str] = None,
    concurrency: Optional[int] = None,
    batch_size: Optional[int] = None,
):
    """Filter/annotate ``ds`` by membership in ``sketch`` (broadcast once).

    The default pool size adapts to the cluster (tuning.actor_pool_size):
    a fixed pool as large as the cluster starves the upstream read tasks
    and hangs the streaming executor on small clusters."""
    from ..tuning import actor_pool_size

    ref = broadcast_sketch(sketch)
    return ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs={
            "sketch_ref": ref,
            "on": on,
            "mode": mode,
            "flag_column": flag_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or actor_pool_size(),
    )


def bloom_semi_join(
    probe_ds,
    build_ds,
    on: str,
    err_rate: float = 0.001,
    capacity: Optional[int] = None,
    concurrency: Optional[int] = None,
):
    """Keep probe rows whose key MAYBE appears in build_ds[on].

    The build side is sketched (one small bitset crosses the cluster instead
    of a shuffled hash table); the result is a superset of the exact
    semi-join — follow with an exact join on the pruned survivor set when
    exactness is required. ``capacity`` defaults to build-side count."""
    from ..kernel.sketch import SketchSpec
    from .builder import build_sketch

    if capacity is None:
        capacity = max(build_ds.count(), 11)
    bf = build_sketch(build_ds, SketchSpec.of("bloom", err_rate, capacity), on=on)
    return probe_filter(probe_ds, bf, on=on, mode="maybe", concurrency=concurrency)
