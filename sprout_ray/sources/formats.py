"""Multi-format ingestion: one entry point over Parquet / CSV / JSONL.

The reference has no reader layer at all (keys arrive via library calls,
/root/reference/cmd/main.go:39-42); the driver corpus is Parquet. Real
corpora also arrive as CSV dumps and JSON-lines crawls, so the engine
accepts all three behind one function that routes to the native Ray Data
readers (each already distributed + streaming):

- Parquet gets column pruning pushed to the scan (only requested columns
  leave storage — the 100 TB-critical path);
- CSV / JSONL cannot prune at the byte level (row-oriented formats); the
  requested projection is applied immediately after parse so only the
  selected columns enter the object store.

Everything downstream (sketch builds, dedup, windows) is format-agnostic:
it sees the same Arrow-backed Dataset either way.
"""

from __future__ import annotations

import os
from typing import Optional

_EXT_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def detect_format(path: str) -> str:
    """Format from the file extension (directories: from their files)."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            ext = os.path.splitext(name)[1].lower()
            if ext in _EXT_FORMATS:
                return _EXT_FORMATS[ext]
        raise ValueError(f"no recognized data files under {path}")
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMATS:
        raise ValueError(f"unrecognized data format: {path}")
    return _EXT_FORMATS[ext]


def read_any(
    paths,
    columns: Optional[list] = None,
    format: Optional[str] = None,
    override_num_blocks: Optional[int] = None,
):
    """Read parquet/csv/jsonl into a Dataset with a consistent projection."""
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    fmt = format or detect_format(first)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if fmt == "parquet":
        return rd.read_parquet(paths, columns=columns, **kwargs)
    if fmt == "csv":
        ds = rd.read_csv(paths, **kwargs)
    elif fmt == "json":
        ds = rd.read_json(paths, **kwargs)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds
