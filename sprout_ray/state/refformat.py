"""Reference on-disk filter-file compatibility (import/export).

The reference persists filters as a raw mmap'd byte file with no header and
no count: the file is the concatenation of each stage's packed bit array.
Layout facts (all cited from /root/reference/bloom.go):

- stage byte width = ``M_bits // 8 + 8`` (bloom.go:120-125 — ``byteSize`` is
  ``unsafe.Sizeof(&b)``, the pointer size 8, added as end slack);
- stage s starts at ``pageOffset_s`` = sum of the previous stages' byte
  widths (bloom.go:127-129: ``pageOffset = opts.dataSize`` captured before
  the stage's own width is added to ``dataSize``);
- bits are MSB-first within a byte (bloom.go:283-294: byte ``idx/8``, mask
  ``128 >> idx%8``), probe slices partitioned per hash function;
- the file is truncated to ``dataSize`` and mmap'd RDWR (bloom.go:398-425);
  ``count`` is never written — a reopened reference filter silently starts
  from count 0 (bloom.go:130-160).

Our :class:`~sprout_ray.kernel.bloom.BloomFilter` keeps its ``bits`` array
in exactly this packed layout, so export/import is a straight byte copy per
stage. ``count`` is not representable in the file, faithfully to the
reference; importers may pass ``count(s)=`` to restore it from external
metadata (our own checkpoints persist it properly).
"""

from __future__ import annotations

import numpy as np

from ..kernel.bloom import BloomFilter
from ..kernel.scalable_bloom import ScalableBloomFilter


def export_filter_file(f, path: str) -> int:
    """Write a BloomFilter or ScalableBloomFilter in the reference's packed
    file layout. Returns the number of bytes written (== reference
    ``dataSize``)."""
    stages = f.filters if isinstance(f, ScalableBloomFilter) else [f]
    written = 0
    with open(path, "wb") as fh:
        for bf in stages:
            buf = bf.bits.tobytes()
            assert len(buf) == bf.bit_width
            fh.write(buf)
            written += len(buf)
    return written


def import_bloom_file(
    path: str, err_rate: float, capacity: int, count: int = 0
) -> BloomFilter:
    """Reconstruct a fixed filter from a reference-layout file.

    Geometry is re-derived from (err_rate, capacity) exactly as the
    reference re-derives it from Options on open; the file must be exactly
    the derived byte width."""
    bf = BloomFilter(err_rate=err_rate, capacity=capacity)
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size != bf.bit_width:
        raise ValueError(
            f"file is {raw.size} bytes; geometry ({err_rate}, {capacity}) "
            f"derives bit_width {bf.bit_width}"
        )
    bf.bits = raw.copy()
    bf.count = int(count)
    return bf


def import_sbf_file(
    path: str,
    err_rate: float,
    initial_capacity: int,
    growth_rate: int = 2,
    counts: list[int] | None = None,
) -> ScalableBloomFilter:
    """Reconstruct a scalable filter from a reference-layout file.

    Stage geometries follow the deterministic growth schedule
    (err_i = err * 0.9^i, cap_i = m0 * growth^(i-1) * ln2,
    scalable_bloom.go:153-178), so the stage count is recovered by
    consuming the file greedily until it is exhausted."""
    sbf = ScalableBloomFilter(
        err_rate=err_rate,
        initial_capacity=initial_capacity,
        growth_rate=growth_rate,
    )
    raw = np.fromfile(path, dtype=np.uint8)
    offset = 0
    stage = 0
    while offset < raw.size:
        if stage >= len(sbf.filters):
            sbf._grow()
        bf = sbf.filters[stage]
        end = offset + bf.bit_width
        if end > raw.size:
            raise ValueError(
                f"file truncated mid-stage {stage}: need {bf.bit_width} bytes "
                f"at offset {offset}, file has {raw.size}"
            )
        bf.bits = raw[offset:end].copy()
        if counts is not None and stage < len(counts):
            bf.count = int(counts[stage])
        offset = end
        stage += 1
    del sbf.filters[stage:]  # drop the unused auto-created tail, if any
    if not sbf.filters:
        raise ValueError("empty filter file")
    return sbf
