"""Value-bearing Put/Get — the reference's filter-guarded KV at dataset scale.

The reference pairs every filter with an embedded KV store: ``Put`` adds the
key to the filter then writes ``key -> value`` through to bolt/badger
(bloom.go:190-197), and ``Get`` consults the filter first, touching the
store only on "maybe" (bloom.go:220-236 — the filter-as-cache-guard
pattern). This module re-expresses that as a persistent, hash-bucketed
Parquet KV:

- ``KVStore.build``: one STREAMING Ray Data pass hash-partitions
  (key, value) rows by murmur3(key) into hive-partitioned Parquet
  (``write_parquet(partition_cols=...)`` — no bucket is ever materialized
  whole in one worker; blocks stream straight to the bucket files), then a
  distributed per-bucket task pass builds one Bloom filter per bucket by
  iterating the bucket's row groups incrementally (reference packed file
  layout via refformat). ``n_buckets`` auto-scales with row count
  (~1M rows/bucket, capped 4096) so bucket size stays bounded as the
  corpus grows. A failed build reruns cheaply: the data write is one
  retryable Ray job, and the per-bucket bloom tasks rebuild from the
  written bucket files — filters are DERIVED state and are never reused
  across a data rewrite (the data pass is mode="overwrite", so a stale
  filter could silently miss keys).
- ``KVStore.get``: groups probe keys by bucket; buckets whose filter says
  "definitely not" for all their keys cost ZERO IO; otherwise only that
  bucket's files are read, filtered to the maybe-keys. No false negatives;
  false positives cost one pruned bucket read, exactly like the
  reference's guarded ``db.Get``.

Unlike the reference (whose store races the filter file on crash), the
manifest (count + geometry per bucket) is written last via tmp + rename,
so ``open`` validates what it loads.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..kernel.bloom import BloomFilter
from .refformat import export_filter_file, import_bloom_file


def _bucket_bloom(files: list, key_col: str, err_rate: float, out_path: str) -> dict:
    """Build one bucket's Bloom filter by streaming its row groups (never
    holds more than one record batch of keys in memory)."""
    nrows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    bf = BloomFilter(err_rate=err_rate, capacity=max(nrows * 2, 11))
    for f in files:
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches(columns=[key_col], batch_size=65536):
            bf.add_batch(batch.column(0))
    export_filter_file(bf, out_path)
    return {"rows": int(nrows), "cap": int(bf.capacity)}


class KVStore:
    """Bloom-guarded, hash-bucketed Parquet KV (open via :meth:`open`)."""

    # data layouts this reader understands; the manifest records which one
    # the build wrote, so a layout change can never be read misaligned
    SUPPORTED_LAYOUTS = ("hive",)

    def __init__(self, path: str, manifest: dict):
        layout = manifest.get("layout")
        if layout not in self.SUPPORTED_LAYOUTS:
            raise ValueError(
                f"KV store at {path!r} has layout={layout!r}; this reader "
                f"supports {self.SUPPORTED_LAYOUTS} — rebuild with "
                "KVStore.build (pre-hive flat-file stores predate the "
                "layout field)"
            )
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
        n_buckets: int | None = None,
        err_rate: float = 0.001,
        rows_per_bucket: int = 1_000_000,
    ) -> "KVStore":
        """Streaming build: hive-partitioned data write + distributed
        per-bucket bloom pass. ``n_buckets=None`` auto-scales with rows."""
        import ray

        from ..functions.hashing import murmur_column

        if n_buckets is None or n_buckets <= 0:
            n = ds.count()
            n_buckets = int(min(4096, max(1, -(-n // rows_per_bucket))))

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

        data_dir = os.path.join(path, "data")
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
            data_dir, partition_cols=["_bucket"], mode="overwrite"
        )

        bloom_task = ray.remote(num_cpus=1)(_bucket_bloom)
        jobs, order = [], []
        for b_dir in sorted(_glob.glob(os.path.join(data_dir, "_bucket=*"))):
            b = int(os.path.basename(b_dir).split("=", 1)[1])
            files = sorted(_glob.glob(os.path.join(b_dir, "*.parquet")))
            if not files:
                continue
            order.append(b)
            jobs.append(
                bloom_task.remote(
                    files, key_col, err_rate,
                    os.path.join(path, f"bucket-{b:04d}.bloom"),
                )
            )
        counts = dict(zip(order, ray.get(jobs)))
        manifest = {
            "n_buckets": n_buckets,
            "key_col": key_col,
            "value_col": value_col,
            "err_rate": err_rate,
            "layout": "hive",
            "buckets": {str(k): v for k, v in sorted(counts.items())},
        }
        tmp = os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, "manifest.json"))
        return KVStore(path, manifest)

    @staticmethod
    def open(path: str) -> "KVStore":
        with open(os.path.join(path, "manifest.json")) as f:
            return KVStore(path, json.load(f))

    # ---- get -----------------------------------------------------------

    def _bucket_files(self, bucket: int) -> list:
        return sorted(
            _glob.glob(
                os.path.join(self.path, "data", f"_bucket={bucket}", "*.parquet")
            )
        )

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
                self._bucket_files(int(b)),
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
