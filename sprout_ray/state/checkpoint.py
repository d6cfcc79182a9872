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


def _build_partition_task(files: list, spec: SketchSpec, on: str) -> tuple:
    """Build one partition's sketch by streaming parquet row groups —
    runs inside a Ray task; memory footprint is one row group + one sketch."""
    from ..stages.builder import update_chunked

    sk = spec.make()
    rows = 0
    for path in files:
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(columns=[on]):
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            if len(col):
                update_chunked(sk, spec.kind, pa.chunked_array([col]))
            rows += batch.num_rows
    return sk.to_bytes(), rows


def build_with_checkpoints(
    input_files: list,
    spec: SketchSpec,
    on: str,
    ckpt_dir: str,
    files_per_partition: int = 1,
    max_concurrency: int = 16,
):
    """Resumable sketch build: one partition per ``files_per_partition`` input
    files; completed partitions are skipped on rerun; returns (sketch, metrics).

    Pending partitions build CONCURRENTLY as Ray tasks (each streams its
    shard's row groups, so per-task memory is one row group + one sketch);
    checkpoints are written the moment each task finishes, so a crash
    mid-run loses at most the in-flight partitions.

    Resume safety: a completed partition is only reused when its recorded
    lineage ``input_files`` equals the partition's CURRENT file list — if
    the input grew or reordered between runs, the stale checkpoint is
    rebuilt instead of silently merging a sketch over the wrong data
    (counted in ``metrics['invalidated']``).
    """
    import ray

    parts = [
        (i, input_files[i * files_per_partition : (i + 1) * files_per_partition])
        for i in range((len(input_files) + files_per_partition - 1) // files_per_partition)
    ]
    done = completed_partitions(ckpt_dir, spec)
    metrics = {
        "partitions": len(parts),
        "resumed": 0,
        "built": 0,
        "invalidated": 0,
        "rows": 0,
    }
    task = ray.remote(_build_partition_task)

    sketches = []
    pending = {}  # ObjectRef -> (pid, files)
    for pid, files in parts:
        if pid in done:
            lin = json.loads(done[pid]["lineage"])
            if lin.get("input_files") == list(files):
                sketches.append(sketch_from_bytes(done[pid]["state"]))
                metrics["resumed"] += 1
                metrics["rows"] += done[pid]["rows"]
                continue
            metrics["invalidated"] += 1  # input shard changed -> rebuild
        ref = task.options(num_cpus=1).remote(files, spec, on)
        pending[ref] = (pid, files)
        # bound in-flight tasks so a long file list doesn't flood the cluster
        while len(pending) >= max_concurrency:
            sketches, metrics = _drain_one(pending, sketches, metrics, ckpt_dir, spec)
    while pending:
        sketches, metrics = _drain_one(pending, sketches, metrics, ckpt_dir, spec)

    acc = sketches[0] if sketches else spec.make()
    for s in sketches[1:]:
        acc.merge(s)
    return acc, metrics


def _drain_one(pending: dict, sketches: list, metrics: dict, ckpt_dir: str, spec):
    """Wait for one partition task; checkpoint + account its result."""
    import ray

    ready, _ = ray.wait(list(pending), num_returns=1)
    ref = ready[0]
    pid, files = pending.pop(ref)
    blob, nrows = ray.get(ref)
    sk = sketch_from_bytes(blob)
    write_partition_checkpoint(ckpt_dir, pid, spec, sk, nrows, files)
    sketches.append(sk)
    metrics["built"] += 1
    metrics["rows"] += nrows
    return sketches, metrics


# ---------------------------------------------------------------------------
# Multi-sketch resumable build: one scan per partition updates EVERY sketch
# (the flagship battery's resume story — the reference can only persist one
# filter per file, bloom.go:410-425; here a 10-sketch battery checkpoints and
# resumes as a unit without re-reading finished shards).
# ---------------------------------------------------------------------------


def _multi_manifest_path(ckpt_dir: str, pid: int) -> str:
    return os.path.join(ckpt_dir, f"multi-{pid:05d}.parquet")


def write_multi_checkpoint(
    ckpt_dir: str, pid: int, specs: dict, blobs: dict, rows: int, input_files: list
) -> str:
    """One parquet file per partition, one row per sketch name (atomic)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    names = sorted(specs)
    lineage = json.dumps(
        {"input_files": list(input_files), "rows": rows,
         "specs": {n: _spec_json(specs[n][0]) for n in names}}
    )
    tbl = pa.table(
        {
            "partition_id": pa.array([pid] * len(names), pa.int64()),
            "name": pa.array(names, pa.string()),
            "sketch_kind": pa.array([specs[n][0].kind for n in names], pa.string()),
            "spec": pa.array([_spec_json(specs[n][0]) for n in names], pa.string()),
            "state": pa.array([blobs[n] for n in names], pa.large_binary()),
            "rows": pa.array([rows] * len(names), pa.int64()),
            "lineage": pa.array([lineage] * len(names), pa.string()),
        }
    )
    final = _multi_manifest_path(ckpt_dir, pid)
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)
    return final


def _load_multi_checkpoint(ckpt_dir: str, pid: int, specs: dict, files: list):
    """Partition's blobs dict if the checkpoint covers every requested sketch
    with matching spec AND lineage; None -> rebuild."""
    path = _multi_manifest_path(ckpt_dir, pid)
    if not os.path.exists(path):
        return None
    rows = pq.read_table(path).to_pylist()
    by_name = {r["name"]: r for r in rows}
    for name, (spec, _on) in specs.items():
        r = by_name.get(name)
        if r is None or r["spec"] != _spec_json(spec):
            return None
        if json.loads(r["lineage"]).get("input_files") != list(files):
            return None
    return {n: by_name[n] for n in specs}


def _build_partition_multi_task(files: list, specs_items: list, derive=None) -> tuple:
    """One streaming scan of the shard updates every sketch.

    ``specs_items``: [(name, spec, on)]. ``derive`` (optional) maps each
    Arrow batch-table before column extraction, so sketches can target
    derived columns (sha256 invariant, content_len) without materializing
    them anywhere."""
    from ..stages.builder import update_chunked

    sks = {name: spec.make() for name, spec, _on in specs_items}
    # derive may reference any input column -> read all; otherwise prune the
    # scan to exactly the sketched columns
    raw_cols = None if derive else sorted({on for _, _, on in specs_items})
    rows = 0
    for path in files:
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(columns=raw_cols):
            t = pa.Table.from_batches([batch])
            if derive is not None:
                t = derive(t)
            for name, spec, on in specs_items:
                col = t.column(on)
                if col.null_count:
                    col = col.drop_null()
                if len(col):
                    update_chunked(sks[name], spec.kind, col)
            rows += batch.num_rows
    return {name: sk.to_bytes() for name, sk in sks.items()}, rows


def build_multi_with_checkpoints(
    input_files: list,
    specs: dict,
    ckpt_dir: str,
    files_per_partition: int = 1,
    max_concurrency: int = 16,
    derive=None,
):
    """Resumable MULTI-sketch build: ``specs`` = name -> (SketchSpec, on).

    One partition per ``files_per_partition`` input files; each pending
    partition is one Ray task that streams its shard's row groups ONCE and
    updates every sketch (same single-scan economics as
    pipelines.flagship.multi_sketch_build, plus checkpoints). A partition
    resumes only when its checkpoint covers every requested sketch with
    matching spec and lineage; partial/stale checkpoints rebuild the whole
    partition (the scan is shared, so per-sketch resume would re-read the
    shard anyway). Returns ({name: sketch}, metrics)."""
    import ray

    parts = [
        (i, input_files[i * files_per_partition : (i + 1) * files_per_partition])
        for i in range(
            (len(input_files) + files_per_partition - 1) // files_per_partition
        )
    ]
    metrics = {"partitions": len(parts), "resumed": 0, "built": 0, "rows": 0}
    specs_items = [(n, s, on) for n, (s, on) in sorted(specs.items())]
    task = ray.remote(_build_partition_multi_task)

    accs: dict = {}
    pending: dict = {}

    def account(blobs: dict, nrows: int):
        for name, (spec, _on) in specs.items():
            b = blobs[name]
            sk = sketch_from_bytes(b if isinstance(b, bytes) else b["state"])
            if name in accs:
                accs[name].merge(sk)
            else:
                accs[name] = sk
        metrics["rows"] += nrows

    def drain_one():
        ready, _ = ray.wait(list(pending), num_returns=1)
        ref = ready[0]
        pid, files = pending.pop(ref)
        blobs, nrows = ray.get(ref)
        write_multi_checkpoint(ckpt_dir, pid, specs, blobs, nrows, files)
        account(blobs, nrows)
        metrics["built"] += 1

    for pid, files in parts:
        done = _load_multi_checkpoint(ckpt_dir, pid, specs, files)
        if done is not None:
            account(done, done[specs_items[0][0]]["rows"])
            metrics["resumed"] += 1
            continue
        ref = task.options(num_cpus=1).remote(files, specs_items, derive)
        pending[ref] = (pid, files)
        while len(pending) >= max_concurrency:
            drain_one()
    while pending:
        drain_one()

    for name, (spec, _on) in specs.items():
        accs.setdefault(name, spec.make())
    return accs, metrics
