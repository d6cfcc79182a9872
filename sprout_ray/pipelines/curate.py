"""Corpus curation pipeline: dedup + quality gate + resumable shard writes.

The write-side twin of ``analytics.curation_survivors`` — what a 100 TB
training-data run actually executes: compute the global exact-dedup winner
set once (only (text-key, doc_id) shuffles; at 10^12 docs substitute the
128-bit fingerprint pair of stages/dedup._dup_pair_ds for raw text),
broadcast the winner ids (``ray.put`` once, read per actor), then stream
every input shard through the vectorized quality gate + winner membership
filter and write one output directory per shard via
``sources.io.resumable_transform_write`` — a killed run resumes, skipping
finished shards entirely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def curate_corpus(
    input_files: list,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_punct: float = 0.3,
    files_per_partition: int = 1,
) -> dict:
    """Write the curated corpus under ``out_dir`` (resumable); returns the
    sink metrics plus the number of winner ids."""
    import ray
    import ray.data as rd

    from ..sources.io import resumable_transform_write
    from ..stages.text import QualityScorer

    ds = rd.read_parquet(input_files, columns=[id_col, text_col])
    winner_rows = (
        ds.groupby(text_col)
        .min(id_col)
        .select_columns([f"min({id_col})"])
        .take_all()
    )
    winners = np.sort(
        np.array([r[f"min({id_col})"] for r in winner_rows], dtype=np.int64)
    )
    winners_ref = ray.put(winners)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = ray.get(winners_ref)
        pos = np.searchsorted(w, ids)
        pos_c = np.minimum(pos, len(w) - 1) if len(w) else pos
        mask = (len(w) > 0) & (w[pos_c] == ids) if len(w) else np.zeros(len(ids), bool)
        return t.filter(pa.array(mask))

    def transform(shard_ds):
        import pyarrow.compute as pc

        return (
            shard_ds.map_batches(
                QualityScorer, batch_format="pyarrow", concurrency=2, batch_size=256
            )
            .filter(expr=f"token_count >= {min_tokens} and punct_ratio <= {max_punct}")
            .map_batches(keep, batch_format="pyarrow")
        )

    metrics = resumable_transform_write(
        input_files, out_dir, transform=transform,
        files_per_partition=files_per_partition,
    )
    metrics["winners"] = int(len(winners))
    return metrics
