"""Sources/sinks: resumable partitioned Parquet output for row transforms.

Complements ``state.checkpoint`` (which checkpoints SKETCH state): this is
the resumable layout for pipelines whose output is row data (filtered /
transformed corpora). One output directory per input shard, written
atomically (tmp + rename), plus a manifest of completed shards — a rerun
skips finished partitions entirely, never re-reading their input.
"""

from __future__ import annotations

import json
import os


def resumable_transform_write(
    input_files: list,
    out_dir: str,
    transform=None,
    columns=None,
    files_per_partition: int = 1,
    output_format: str = "parquet",
) -> dict:
    """Apply ``transform(Dataset) -> Dataset`` per input-shard group and write
    each group's result under ``out_dir/part=<i>/``; skip completed groups.

    ``output_format``: "parquet" (default) or "jsonl" (newline-delimited
    JSON via ``Dataset.write_json`` — the shard format most training
    loaders consume; round-trips through ``sources.formats.read_any``).

    Returns metrics {partitions, written, resumed}. The unit of recovery is
    the input shard group: output for a partition appears only after its
    rename, so a killed run leaves either nothing or a complete partition.
    """
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported output_format {output_format!r}")
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    done = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = json.load(f)

    groups = [
        (i, input_files[i * files_per_partition : (i + 1) * files_per_partition])
        for i in range(
            (len(input_files) + files_per_partition - 1) // files_per_partition
        )
    ]
    metrics = {"partitions": len(groups), "written": 0, "resumed": 0}
    for pid, files in groups:
        key = str(pid)
        part_dir = os.path.join(out_dir, f"part={pid:05d}")
        if key in done and os.path.isdir(part_dir):
            prev_fmt = done[key].get("format", "parquet")
            if prev_fmt != output_format:
                raise ValueError(
                    f"resume format mismatch in {out_dir}: partition {pid} "
                    f"was written as {prev_fmt!r}, run requests "
                    f"{output_format!r} — use a fresh out_dir"
                )
            metrics["resumed"] += 1
            continue
        ds = rd.read_parquet(files, columns=columns)
        if transform is not None:
            ds = transform(ds)
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        if output_format == "jsonl":
            ds.write_json(tmp_dir)
        else:
            ds.write_parquet(tmp_dir)
        os.replace(tmp_dir, part_dir)
        done[key] = {"input_files": files, "format": output_format}
        with open(manifest_path, "w") as f:
            json.dump(done, f)
        metrics["written"] += 1
    return metrics
