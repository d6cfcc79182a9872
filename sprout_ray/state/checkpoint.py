"""Per-partition sketch checkpoints with lineage + metrics (SURVEY.md §4.3.4).

Replaces the reference's persistence layer (mmap filter file + bolt/badger
stores, /root/reference/bloom.go:410-443, storage.go) with Parquet checkpoint
rows keyed by ``(job_id, stage, partition_id)``:

    partition_id:int64, sketch_kind:string, spec:string(json),
    state:large_binary, rows:int64, lineage:string(json)

Deliberately better than the reference, which never persists ``count``
(reopening a filter file keeps bits but resets count — bloom.go:130-160 has
no deserialization path): our ``state`` blob round-trips full metadata, so a
resumed build has correct capacity accounting.

Resume contract: each input shard (file) is one partition. A rerun loads the
manifest of completed partitions, skips their input files entirely, builds
partials only for the missing ones, and merges old + new — giving
mid-scan resumability for any Sketch.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.sketch import SketchSpec, sketch_from_bytes


@dataclass
class PartitionLineage:
    input_files: list
    spec: str
    rows: int


def _spec_json(spec: SketchSpec) -> str:
    return json.dumps(
        {"kind": spec.kind, "params": list(spec.params), "kwargs": list(spec.kwargs)}
    )


def checkpoint_dir_schema() -> pa.Schema:
    return pa.schema(
        [
            ("partition_id", pa.int64()),
            ("sketch_kind", pa.string()),
            ("spec", pa.string()),
            ("state", pa.large_binary()),
            ("rows", pa.int64()),
            ("lineage", pa.string()),
        ]
    )


def write_partition_checkpoint(
    ckpt_dir: str,
    partition_id: int,
    spec: SketchSpec,
    sketch,
    rows: int,
    input_files: list,
) -> str:
    """Write one partition's sketch checkpoint atomically (tmp + rename)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    lineage = PartitionLineage(
        input_files=list(input_files), spec=_spec_json(spec), rows=rows
    )
    tbl = pa.table(
        {
            "partition_id": pa.array([partition_id], pa.int64()),
            "sketch_kind": pa.array([spec.kind], pa.string()),
            "spec": pa.array([_spec_json(spec)], pa.string()),
            "state": pa.array([sketch.to_bytes()], pa.large_binary()),
            "rows": pa.array([rows], pa.int64()),
            "lineage": pa.array([json.dumps(asdict(lineage))], pa.string()),
        },
        schema=checkpoint_dir_schema(),
    )
    final = os.path.join(ckpt_dir, f"part-{partition_id:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)
    return final


def completed_partitions(ckpt_dir: str, spec: SketchSpec) -> dict:
    """partition_id -> checkpoint row dict, for checkpoints matching spec."""
    if not os.path.isdir(ckpt_dir):
        return {}
    done = {}
    want = _spec_json(spec)
    for p in sorted(os.listdir(ckpt_dir)):
        if not p.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(ckpt_dir, p))
        for row in t.to_pylist():
            if row["spec"] == want:
                done[row["partition_id"]] = row
    return done


def build_with_checkpoints(
    input_files: list,
    spec: SketchSpec,
    on: str,
    ckpt_dir: str,
    files_per_partition: int = 1,
):
    """Resumable sketch build: one partition per ``files_per_partition`` input
    files; completed partitions are skipped on rerun; returns (sketch, metrics).

    The per-partition build itself streams through Ray Data
    (read_parquet(shard) -> partials -> merge) so each partition's memory
    footprint is one block + one sketch.
    """
    from ..stages.builder import build_partials, merge_partials

    import ray.data as rd

    parts = [
        (i, input_files[i * files_per_partition : (i + 1) * files_per_partition])
        for i in range((len(input_files) + files_per_partition - 1) // files_per_partition)
    ]
    done = completed_partitions(ckpt_dir, spec)
    metrics = {"partitions": len(parts), "resumed": len(done), "built": 0, "rows": 0}
    sketches = []
    for pid, files in parts:
        if pid in done:
            sketches.append(sketch_from_bytes(done[pid]["state"]))
            metrics["rows"] += done[pid]["rows"]
            continue
        ds = rd.read_parquet(files, columns=[on])
        rows_blobs = build_partials(ds, spec, on).take_all()
        sk = merge_partials([r["partial"] for r in rows_blobs], spec)
        nrows = sum(r["rows"] for r in rows_blobs)
        write_partition_checkpoint(ckpt_dir, pid, spec, sk, nrows, files)
        sketches.append(sk)
        metrics["built"] += 1
        metrics["rows"] += nrows
    acc = sketches[0] if sketches else spec.make()
    for s in sketches[1:]:
        acc.merge(s)
    return acc, metrics
