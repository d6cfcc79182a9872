"""Flagship pipeline — the Ray-Data re-expression of the reference demo.

The reference demo (/root/reference/cmd/main.go:24-47) builds a bloom filter
over 20M formatted-int keys, probes it, and prints Stats + elapsed. Here the
equivalent job is: read the source-code Parquet corpus -> append the
``sha256(content)`` invariant column -> build the full sketch battery in one
streaming pass -> probe membership -> emit stats.

Everything streams: the only driver-materialized data are serialized partial
sketches (one per block) and the final stats rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import add_sha256
from ..kernel.sketch import SketchSpec
from ..stages.builder import build_partials, build_sketch, merge_partials


def with_invariant(ds, content_col: str = "content"):
    """Append the per-row sha256 invariant column (BASELINE.json:input_hint)."""
    return ds.map_batches(
        lambda t: add_sha256(t, column=content_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def multi_sketch_build(ds, specs: dict, fan_in: int = 8, driver_max: int = 4) -> dict:
    """Build several sketches in ONE pass over the data.

    ``specs``: name -> (SketchSpec, column). A single map_batches stage
    updates every sketch per block and emits one row of serialized partials
    per block. One scan, N sketches — at 100 TB this halves-or-better the IO
    vs building each sketch separately.

    The reduce is a DATASET-NATIVE tree: while more than ``driver_max``
    partial rows remain, a map_batches(batch_size=fan_in) stage merges
    fan_in rows into one IN PARALLEL on the workers; only the last
    <= driver_max partials land on the driver. A 64-block build used to
    decompress+OR ~4 GB of bloom partials serially on the driver (~10 s of
    fixed, cluster-size-independent wall that capped scaling efficiency);
    now that work rides the worker pool.
    """
    from ..stages.builder import pack_partial, update_chunked

    items = list(specs.items())

    def per_block(batch: pa.Table) -> pa.Table:
        out = {}
        for name, (spec, col_name) in items:
            col = batch.column(col_name)
            if col.null_count:
                col = col.drop_null()
            sk = spec.make()
            if len(col):
                update_chunked(sk, spec.kind, col)
            out[name] = [pack_partial(sk.to_bytes())]
        out["rows"] = [batch.num_rows]
        return pa.table(
            {
                **{k: pa.array(v, pa.large_binary()) for k, v in out.items() if k != "rows"},
                "rows": pa.array(out["rows"], pa.int64()),
            }
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, (spec, _col) in items:
            sk = merge_partials(batch[name].to_pylist(), spec)
            # intermediates ship raw ("R0"): they cross the object store
            # exactly once, and zlib on increasingly dense upper-level
            # bitmaps costs more CPU than the memcpy it saves
            cols[name] = pa.array([b"R0" + sk.to_bytes()], pa.large_binary())
        total = sum(batch["rows"].to_pylist())
        cols["rows"] = pa.array([total], pa.int64())
        return pa.table(cols)

    merged = ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # two LAZY tree levels (fan_in^2 reduction, 64x at the default) chained
    # before any materialize: merge tasks start as soon as fan_in leaf
    # partials exist, so the reduce OVERLAPS the scan instead of waiting on
    # a barrier — the barrier version charged the whole merge tree as
    # cluster-size-independent fixed wall, capping scaling efficiency.
    for _ in range(2):
        merged = merged.map_batches(
            merge_rows, batch_format="pyarrow", batch_size=fan_in
        )
    merged = merged.materialize()
    n = merged.count()
    while n > driver_max:  # fallback for block counts beyond fan_in^2
        merged = merged.map_batches(
            merge_rows, batch_format="pyarrow", batch_size=fan_in
        ).materialize()
        new_n = merged.count()
        if new_n >= n:  # batching didn't coalesce; fall back to driver merge
            break
        n = new_n
    partial_rows = merged.take_all()

    # merge the kinds concurrently: zlib decompress + numpy merges release
    # the GIL, so threads parallelize the (small) driver-side reduce
    from concurrent.futures import ThreadPoolExecutor

    built = {}
    with ThreadPoolExecutor(max_workers=min(len(items), 8)) as pool:
        futures = {
            name: pool.submit(
                merge_partials, [r[name] for r in partial_rows], spec
            )
            for name, (spec, _col) in items
        }
        for name, fut in futures.items():
            built[name] = fut.result()
    built["_rows"] = sum(r["rows"] for r in partial_rows)
    return built


def flagship(sf_or_dir, err_rate: float = 0.001, capacity: int | None = None):
    """Full flagship job over a corpus directory (or explicit file list).

    Returns a stats Dataset-convertible pyarrow Table: one row per sketch
    with its parameters and result summary.
    """
    from ..sources.synth import read_corpus

    ds = read_corpus(sf_or_dir, columns=["repo", "path", "lang", "content"])
    n = ds.count()
    cap = capacity or max(int(n * 1.2), 11)
    ds = with_invariant(ds)
    # content length for the quantile sketches, computed vectorized
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda t: t.append_column("content_len", pc.utf8_length(t["content"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    built = multi_sketch_build(
        ds,
        {
            "bloom_sha": (SketchSpec.of("bloom", err_rate, cap), "sha256"),
            "sbf_sha": (SketchSpec.of("sbf", err_rate, max(cap // 10, 11)), "sha256"),
            "hll_repo": (SketchSpec.of("hll", 14), "repo"),
            "hll_sha": (SketchSpec.of("hll", 14), "sha256"),
            "cms_path": (SketchSpec.of("cms", 0.0001, 0.01), "path"),
            "cms_lang": (SketchSpec.of("cms", 0.0001, 0.01), "lang"),
            "tdigest_len": (SketchSpec.of("tdigest", 200.0), "content_len"),
            "kll_len": (SketchSpec.of("kll", 200), "content_len"),
        },
    )

    rows = []
    for name, sk in built.items():
        if name == "_rows":
            continue
        r = sk.result()
        rows.append(
            {
                "sketch": name,
                "kind": type(sk).__name__,
                "summary": str(r)[:200],
                "rows_seen": built["_rows"],
            }
        )
    return pa.Table.from_pylist(rows)


def flagship_over_documents(sf_dir: str) -> pa.Table:
    """Flagship sketch battery over the driver's ``documents`` table.

    Maps the table onto the north-rule corpus shape
    (text -> content, source -> repo; BASELINE.json:input_hint mapping noted
    in FIXTURES.md F4), appends the sha256 invariant, and builds the whole
    battery in one streaming pass. Returns one stats row per sketch.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    n = ds.count()
    cap = max(int(n * 1.2), 11)

    def remap(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["source"].cast(pa.string()),
                "path": pc.binary_join_element_wise(
                    pa.array(["doc"] * t.num_rows),
                    t["doc_id"].cast(pa.string()),
                    "-",
                ),
                "lang": t["lang"],
                "content": t["text"].cast(pa.large_string()),
                "content_len": t["n_chars"].cast(pa.int64()),
            }
        )

    ds = ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)
    ds = with_invariant(ds)
    built = multi_sketch_build(
        ds,
        {
            "bloom_sha": (SketchSpec.of("bloom", 0.001, cap), "sha256"),
            "sbf_sha": (SketchSpec.of("sbf", 0.001, max(cap // 10, 11)), "sha256"),
            "hll_repo": (SketchSpec.of("hll", 14), "repo"),
            "hll_sha": (SketchSpec.of("hll", 14), "sha256"),
            "cms_path": (SketchSpec.of("cms", 0.0001, 0.01), "path"),
            "cms_lang": (SketchSpec.of("cms", 0.0001, 0.01), "lang"),
            "tdigest_len": (SketchSpec.of("tdigest", 200.0), "content_len"),
            "kll_len": (SketchSpec.of("kll", 200), "content_len"),
            "mg_lang": (SketchSpec.of("mg", 256), "lang"),
            "kmv_repo": (SketchSpec.of("kmv", 512), "repo"),
        },
    )
    rows = []
    for name, sk in built.items():
        if name == "_rows":
            continue
        rows.append(
            {
                "sketch": name,
                "kind": type(sk).__name__,
                "summary": str(sk.result())[:200],
                "rows_seen": built["_rows"],
            }
        )
    return pa.Table.from_pylist(rows)


def build_corpus_bloom(
    dir_or_files,
    key: str = "sha256",
    err_rate: float = 0.001,
    capacity: int | None = None,
    mode: str = "partials",
):
    """Read -> invariant -> bloom build; returns (filter, row_count)."""
    from ..sources.synth import read_corpus

    cols = ["content"] if key == "sha256" else [key]
    ds = read_corpus(dir_or_files, columns=cols)
    n = ds.count()
    cap = capacity or max(int(n * 1.2), 11)
    if key == "sha256":
        ds = with_invariant(ds)
    bf = build_sketch(ds, SketchSpec.of("bloom", err_rate, cap), on=key, mode=mode)
    return bf, n
