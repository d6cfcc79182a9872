"""Table profiling (ANALYZE-style per-column statistics).

The catalog-statistics pass every engine runs before planning, in the
scale shape this repo uses everywhere:

- count / null-count / min / max: ONE streaming pass emitting a single
  partial row per block with NATIVE-typed per-column min/max (string
  mins compare as strings, ints as ints — stringification happens only
  in the final output), reduced on the driver from O(blocks) rows;
- distinct counts: one `multi_sketch_build` scan building a KMV per
  column (pipelines/flagship.py — one pass for all columns, streaming
  tree reduce). Below capacity the KMV retains every distinct key, so
  `is_exact()` certifies the count is exact (the repo's exact-degenerate
  oracle pattern); above capacity it is a (1 +/- 1/sqrt(k)) estimate and
  the row says so.

No shuffle anywhere: both passes are map-only with sketch-sized or
block-count-sized reductions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def profile_columns(ds, columns: list[str], distinct_k: int = 65536):
    """Per-column stats table: (column, n, n_null, n_distinct,
    distinct_exact, min_value, max_value) — min/max cast to string in the
    output only (comparisons run on the native type, nulls skipped;
    all-null columns yield null min/max)."""
    from ..kernel.sketch import SketchSpec
    from ..pipelines.flagship import multi_sketch_build

    def per_block(t: pa.Table) -> pa.Table:
        row = {"n": pa.array([t.num_rows], pa.int64())}
        for c in columns:
            col = t[c]
            row[f"null_{c}"] = pa.array([col.null_count], pa.int64())
            if t.num_rows - col.null_count > 0:
                mm = pc.min_max(col)
                mn, mx = mm["min"], mm["max"]
            else:
                mn = mx = pa.scalar(None, col.type)
            row[f"min_{c}"] = pa.array([mn.as_py()], col.type)
            row[f"max_{c}"] = pa.array([mx.as_py()], col.type)
        return pa.table(row)

    parts = pa.concat_tables(
        t
        for t in ray.get(
            ds.map_batches(
                per_block,
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            ).to_arrow_refs()
        )
        if t.num_rows
    )
    kmvs = multi_sketch_build(
        ds, {c: (SketchSpec.of("kmv", distinct_k), c) for c in columns}
    )

    n = int(pc.sum(parts["n"]).as_py() or 0)
    rows = []
    for c in sorted(columns):
        sk = kmvs[c]
        mn = pc.min(parts[f"min_{c}"]).as_py()
        mx = pc.max(parts[f"max_{c}"]).as_py()
        rows.append(
            {
                "column": c,
                "n": n,
                "n_null": int(pc.sum(parts[f"null_{c}"]).as_py() or 0),
                "n_distinct": int(round(sk.estimate())),
                "distinct_exact": bool(sk.is_exact()),
                "min_value": None if mn is None else str(mn),
                "max_value": None if mx is None else str(mx),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("column", pa.string()),
                ("n", pa.int64()),
                ("n_null", pa.int64()),
                ("n_distinct", pa.int64()),
                ("distinct_exact", pa.bool_()),
                ("min_value", pa.string()),
                ("max_value", pa.string()),
            ]
        ),
    )


def skew_stats(ds, columns: list[str], label_prefix: str = ""):
    """Exact key-skew statistics for ``columns`` of one Dataset in ONE
    scan: occurrence count, distinct count, F2 = sum(count^2) (the
    self-join size / AMS second moment — the statistic that decides
    whether a groupby/join key needs salting) and the hottest key's
    count.

    All requested columns ride a single packed "label\\x1fkey" key space
    per block (the multi-column-groupby workaround, CLAUDE.md) through
    one thinned groupby; per-block stats partials + a |columns|-row
    native finishing aggregate close it out. Returns a pa.Table
    (col, n, n_distinct, f2, max_count) sorted by col."""
    from ray.data.aggregate import Max, Sum

    def part(t: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            g = (
                t.select([c])
                .drop_null()
                .group_by([c])
                .aggregate([(c, "count")])
            )
            label = pa.array(
                [f"{label_prefix}{c}"] * g.num_rows, pa.string()
            )
            kv = pc.binary_join_element_wise(
                label, pc.cast(g[c], pa.string()), "\x1f"
            )
            outs.append(
                pa.table({"kv": kv, "c": g[f"{c}_count"].cast(pa.int64())})
            )
        return pa.concat_tables(outs)

    def stats_part(t: pa.Table) -> pa.Table:
        col = pc.list_element(pc.split_pattern(t["kv"], "\x1f"), 0)
        c = t["sum(c)"]
        g = (
            pa.table(
                {
                    "col": col,
                    "n": c,
                    "one": pa.array(np.ones(len(c), np.int64)),
                    "c2": pc.multiply(c, c),
                    "mx": c,
                }
            )
            .group_by(["col"])
            .aggregate(
                [("n", "sum"), ("one", "sum"), ("c2", "sum"), ("mx", "max")]
            )
        )
        return g.rename_columns(["col", "n", "one", "c2", "mx"])

    agg = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kv")
        .sum("c", ignore_nulls=True)
        .map_batches(stats_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(Sum("n"), Sum("one"), Sum("c2"), Max("mx"))
        .take_all()  # one row per profiled column
    )
    rows = [
        {
            "col": r["col"],
            "n": int(r["sum(n)"]),
            "n_distinct": int(r["sum(one)"]),
            "f2": int(r["sum(c2)"]),
            "max_count": int(r["max(mx)"]),
        }
        for r in agg
    ]
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("col", pa.string()),
                ("n", pa.int64()),
                ("n_distinct", pa.int64()),
                ("f2", pa.int64()),
                ("max_count", pa.int64()),
            ]
        ),
    ).sort_by("col")
