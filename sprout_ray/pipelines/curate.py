"""Corpus curation pipeline: dedup + quality gate + resumable shard writes.

The write-side twin of ``analytics.curation_survivors`` — what a 100 TB
training-data run actually executes: compute the global exact-dedup winner
set once (only (text-key, doc_id) shuffles; at 10^12 docs substitute the
128-bit fingerprint pair of stages/dedup._dup_pair_ds for raw text), then
stream every input shard through the vectorized quality gate + winner
membership filter and write one output directory per shard via
``sources.io.resumable_transform_write`` — a killed run resumes, skipping
finished shards entirely.

The winner membership filter is SIZE-GUARDED (mirroring
``stages.dedup.exact_dedup``): up to ``broadcast_max`` winners the sorted id
array is broadcast once (``ray.put``, read per actor) and every block
filters locally; above that the winner ids stay a materialized Dataset in
the object store and each shard runs a distributed hash SEMI-JOIN against
them — the winner set is ~the distinct-document count, i.e. O(corpus), so
an unconditional driver materialization could never survive 100 TB. Both
paths sort each shard's survivors by id before writing, so output content
is identical regardless of which path ran (asserted in tests/test_io.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    input_files: list,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_punct: float = 0.3,
    files_per_partition: int = 1,
    broadcast_max: int = 4_000_000,
    split_fractions: list | None = None,
    benchmark_files: list | None = None,
    decontam_n: int = 8,
    decontam_min_shared: int = 1,
) -> dict:
    """Write the curated corpus under ``out_dir`` (resumable); returns the
    sink metrics plus the number of winner ids.

    ``split_fractions`` (e.g. ``[("train", .8), ("val", .1), ("test", .1)]``)
    appends a deterministic seeded-murmur ``split`` column per surviving doc
    (stages/sampling.assign_split — shuffle-free, rerun-stable, so resumed
    and fresh runs assign identically).

    ``benchmark_files`` switches on benchmark decontamination
    (stages/decontam.py): docs sharing >= ``decontam_min_shared`` distinct
    word-``decontam_n``-grams with the benchmark corpus are dropped. The
    contaminated-id set is computed ONCE over the full input (broadcast
    Bloom prune + exact verify) and applied per shard with the same
    broadcast/semi-join size guard as the winner filter. Completes the
    end-to-end training-data flow: dedup -> decontaminate -> quality gate
    -> split -> partitioned shards."""
    import ray
    import ray.data as rd

    from ..sources.io import resumable_transform_write
    from ..stages.text import QualityScorer

    ds = rd.read_parquet(input_files, columns=[id_col, text_col])
    winners_ds = (
        ds.groupby(text_col)
        .min(id_col)
        .map_batches(
            lambda t: pa.table({id_col: t[f"min({id_col})"]}),
            batch_format="pyarrow",
        )
        .materialize()  # ids only — object store (spills fine), reused per shard
    )
    n_winners = winners_ds.count()

    if n_winners <= broadcast_max:
        from ..stages.dedup import _collect_table

        winners = np.sort(
            _collect_table(winners_ds, pa.schema([(id_col, pa.int64())]))[
                id_col
            ].to_numpy(zero_copy_only=False)
        )
        winners_ref = ray.put(winners)

        def keep(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            w = ray.get(winners_ref)
            if not len(w):
                return t.filter(pa.array(np.zeros(len(ids), bool)))
            pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
            return t.filter(pa.array(w[pos] == ids))

        def winner_filter(shard_ds):
            return shard_ds.map_batches(keep, batch_format="pyarrow")

    else:
        # winner ids alone outgrow one node: distributed hash semi-join of
        # the shard stream against the materialized winner-id Dataset
        # (winner ids are unique, so inner join = semi-join)
        join_parts = max(2, n_winners // 4_000_000)

        def winner_filter(shard_ds):
            return shard_ds.join(
                winners_ds,
                join_type="inner",
                num_partitions=join_parts,
                on=(id_col,),
            )

    n_bad = 0
    contam_filter = None
    if benchmark_files is not None:
        from ..stages.decontam import contamination_counts

        bench_ds = rd.read_parquet(benchmark_files, columns=[text_col])
        counts = contamination_counts(
            ds, bench_ds, text_col=text_col, id_col=id_col, n=decontam_n
        )
        if decontam_min_shared > 1:
            counts = counts.filter(
                expr=f"shared_grams >= {decontam_min_shared}"
            )
        bad_ds = counts.select_columns([id_col]).materialize()
        n_bad = bad_ds.count()
        if n_bad and n_bad <= broadcast_max:
            from ..stages.dedup import _collect_table

            bad = np.sort(
                _collect_table(bad_ds, pa.schema([(id_col, pa.int64())]))[
                    id_col
                ].to_numpy(zero_copy_only=False)
            )
            bad_ref = ray.put(bad)

            def drop_bad(t: pa.Table) -> pa.Table:
                b = ray.get(bad_ref)
                ids = t[id_col].to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(b, ids), b.size - 1)
                return t.filter(pa.array(b[pos] != ids))

            def contam_filter(shard_ds):
                return shard_ds.map_batches(drop_bad, batch_format="pyarrow")

        elif n_bad:
            flagged = bad_ds.map_batches(
                lambda t: t.append_column(
                    "__contaminated", pa.array(np.ones(len(t), bool))
                ),
                batch_format="pyarrow",
            ).materialize()

            def contam_filter(shard_ds):
                joined = shard_ds.join(
                    flagged,
                    join_type="left_outer",
                    num_partitions=max(2, n_bad // 4_000_000),
                    on=(id_col,),
                )
                return joined.map_batches(
                    lambda t: t.filter(
                        pc.is_null(t["__contaminated"])
                    ).drop_columns(["__contaminated"]),
                    batch_format="pyarrow",
                )

    # size the scorer actor pool to leave CPU headroom for the read/filter/
    # sort TASKS sharing the cluster — concurrency == num_cpus deadlocks the
    # streaming executor ("cluster does not have any available CPUs") on
    # small clusters
    cpus = int(ray.cluster_resources().get("CPU", 2))
    scorer_conc = max(1, min(4, cpus // 2))

    def transform(shard_ds):
        kept = winner_filter(
            shard_ds.map_batches(
                QualityScorer, batch_format="pyarrow",
                concurrency=scorer_conc, batch_size=256,
            ).filter(
                expr=f"token_count >= {min_tokens} and punct_ratio <= {max_punct}"
            )
        )
        if contam_filter is not None:
            kept = contam_filter(kept)
        if split_fractions is not None:
            from ..stages.sampling import assign_split

            kept = assign_split(kept, id_col, split_fractions)
        return kept.sort(id_col)  # deterministic shard content on either path

    metrics = resumable_transform_write(
        input_files, out_dir, transform=transform,
        files_per_partition=files_per_partition,
    )
    metrics["winners"] = int(n_winners)
    if benchmark_files is not None:
        metrics["contaminated"] = int(n_bad)
    return metrics
