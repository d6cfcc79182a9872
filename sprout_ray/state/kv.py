"""Value-bearing Put/Get — the reference's filter-guarded KV at dataset scale.

The reference pairs every filter with an embedded KV store: ``Put`` adds the
key to the filter then writes ``key -> value`` through to bolt/badger
(bloom.go:190-197), and ``Get`` consults the filter first, touching the
store only on "maybe" (bloom.go:220-236 — the filter-as-cache-guard
pattern). This module re-expresses that as a persistent, hash-bucketed
Parquet KV:

- ``KVStore.build``: one Ray Data pass hash-partitions (key, value) rows
  into ``n_buckets`` Parquet files by murmur3(key) and builds one Bloom
  filter per bucket (written alongside, in the reference's packed file
  layout via refformat). Writing is per-bucket, so a failed build can be
  rerun per missing bucket.
- ``KVStore.get``: groups probe keys by bucket; buckets whose filter says
  "definitely not" for all their keys cost ZERO IO; otherwise only that
  bucket's file is read, filtered to the maybe-keys. No false negatives;
  false positives cost one pruned bucket read, exactly like the
  reference's guarded ``db.Get``.

Unlike the reference (whose store races the filter file on crash), bucket
files + filters are written atomically (tmp + rename) and carry a manifest
with count + geometry, so ``open`` validates what it loads.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..kernel.bloom import BloomFilter
from .refformat import export_filter_file, import_bloom_file


class KVStore:
    """Bloom-guarded, hash-bucketed Parquet KV (open via :meth:`open`)."""

    def __init__(self, path: str, manifest: dict):
        self.path = path
        self.manifest = manifest
        self.n_buckets = manifest["n_buckets"]
        self.key_col = manifest["key_col"]
        self.value_col = manifest["value_col"]
        self._filters: dict[int, BloomFilter] = {}  # lazy per-bucket load

    # ---- build ---------------------------------------------------------

    @staticmethod
    def build(
        ds,
        key_col: str,
        value_col: str,
        path: str,
        n_buckets: int = 16,
        err_rate: float = 0.001,
    ) -> "KVStore":
        """One pass: bucket rows by murmur3(key) % n_buckets, write each
        bucket's (key, value) Parquet + its Bloom filter."""
        from ..functions.hashing import murmur_column

        os.makedirs(path, exist_ok=True)

        def tag(batch: pa.Table) -> pa.Table:
            h = murmur_column(batch[key_col], 0)
            b = (h % np.uint64(n_buckets)).view(np.int64)
            return pa.table(
                {
                    key_col: batch[key_col],
                    value_col: batch[value_col],
                    "_bucket": pa.array(b),
                }
            )

        tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        counts = {}
        # groupby shuffle co-locates each bucket; map_groups writes one
        # bucket file + filter per group (buckets are few and fat, so the
        # per-group-Python cost is n_buckets calls, not a singleton sea)
        import pandas as pd

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            b = int(g["_bucket"].iloc[0])
            t = pa.Table.from_pandas(
                g[[key_col, value_col]], preserve_index=False
            )
            tmp = os.path.join(path, f"bucket-{b:04d}.parquet.tmp")
            final = os.path.join(path, f"bucket-{b:04d}.parquet")
            pq.write_table(t, tmp)
            os.replace(tmp, final)
            bf = BloomFilter(err_rate=err_rate, capacity=max(len(g) * 2, 11))
            bf.add_batch(t[key_col].combine_chunks())
            export_filter_file(bf, os.path.join(path, f"bucket-{b:04d}.bloom"))
            return pd.DataFrame({"bucket": [b], "rows": [len(g)], "cap": [bf.capacity]})

        stats = (
            tagged.groupby("_bucket")
            .map_groups(write_bucket, batch_format="pandas")
            .to_pandas()
        )
        counts = {int(r.bucket): {"rows": int(r.rows), "cap": int(r.cap)} for r in stats.itertuples()}
        manifest = {
            "n_buckets": n_buckets,
            "key_col": key_col,
            "value_col": value_col,
            "err_rate": err_rate,
            "buckets": {str(k): v for k, v in sorted(counts.items())},
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        return KVStore(path, manifest)

    @staticmethod
    def open(path: str) -> "KVStore":
        with open(os.path.join(path, "manifest.json")) as f:
            return KVStore(path, json.load(f))

    # ---- get -----------------------------------------------------------

    def _filter_for(self, bucket: int) -> BloomFilter | None:
        if bucket in self._filters:
            return self._filters[bucket]
        meta = self.manifest["buckets"].get(str(bucket))
        if meta is None:
            return None  # bucket never written -> no keys hash here
        bf = import_bloom_file(
            os.path.join(self.path, f"bucket-{bucket:04d}.bloom"),
            err_rate=self.manifest["err_rate"],
            capacity=meta["cap"],
        )
        self._filters[bucket] = bf
        return bf

    def get(self, keys: list) -> dict:
        """key -> value (absent keys omitted — the reference returns nil).

        Buckets whose filter rejects all their probe keys are never read."""
        from ..functions.hashing import murmur_column

        if not keys:
            return {}
        karr = pa.array([k if isinstance(k, str) else k.decode() for k in keys])
        h = murmur_column(karr, 0)
        buckets = (h % np.uint64(self.n_buckets)).view(np.int64)
        out: dict = {}
        for b in np.unique(buckets):
            bf = self._filter_for(int(b))
            if bf is None:
                continue
            sub = karr.filter(pa.array(buckets == b))
            maybe = bf.contains_batch(sub)
            if not maybe.any():
                continue  # definite miss for the whole bucket: zero IO
            probe = sub.filter(pa.array(maybe))
            t = pq.read_table(
                os.path.join(self.path, f"bucket-{int(b):04d}.parquet"),
                columns=[self.key_col, self.value_col],
            )
            hit = t.filter(pc.is_in(t[self.key_col], value_set=probe))
            for k, v in zip(
                hit[self.key_col].to_pylist(), hit[self.value_col].to_pylist()
            ):
                out[k] = v
        return out

    def io_stats(self, keys: list) -> dict:
        """How many buckets a get(keys) would read (prune observability)."""
        from ..functions.hashing import murmur_column

        karr = pa.array([k if isinstance(k, str) else k.decode() for k in keys])
        h = murmur_column(karr, 0)
        buckets = (h % np.uint64(self.n_buckets)).view(np.int64)
        touched = 0
        total = len(np.unique(buckets))
        for b in np.unique(buckets):
            bf = self._filter_for(int(b))
            if bf is None:
                continue
            sub = karr.filter(pa.array(buckets == b))
            if bf.contains_batch(sub).any():
                touched += 1
        return {"buckets_probed": total, "buckets_read": touched}
