"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (driver spec):

- exact: hash-partition on a content hash, keep first (min id) per group —
  one shuffle of (hash, id) pairs, never content;
- MinHash+LSH: shingle -> minhash signature per doc (vectorized per batch)
  -> explode to (band_id, band_hash, doc_id) rows -> groupby bands ->
  candidate pairs -> signature-estimated Jaccard filter -> connected
  components by iterated min-label propagation (a few small shuffles);
- SimHash: 64-bit signature, 16-bit band blocking, Hamming verification;
- n-gram Jaccard: the exact verifier used on candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.murmur3 import murmur3_64_batch

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds, key_col: str, id_col: str, keep_cols=None):
    """Keep the first row (min id) per key. One groupby shuffle.

    At scale: pre-aggregate min(id) per key inside each block first is
    already what Ray's hash aggregate does; content never crosses the wire
    when key_col is a digest column."""
    firsts = ds.groupby(key_col).min(id_col, ignore_nulls=True)
    keep = firsts.map_batches(
        lambda t: t.rename_columns([key_col, id_col]),
        batch_format="pyarrow",
    )
    if keep_cols is None:
        return keep
    # pull the surviving full rows via an id semi-join (broadcast id set)
    import ray

    ids_ref = ray.put(
        set(r[id_col] for r in keep.select_columns([id_col]).take_all())
    )

    def keep_rows(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        mask = pa.array([v in ids for v in batch[id_col].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def char_shingles(text: str, k: int = 5) -> list:
    if len(text) < k:
        return [text] if text else []
    return [text[i : i + k] for i in range(len(text) - k + 1)]


class MinHasher:
    """Actor-pool stage: per-doc minhash signature over char-k-shingles.

    Universal-hash permutations ``(a*h + b) mod p`` over a base murmur3
    shingle hash; signature computed with one broadcasted numpy op per doc.
    Emits ``doc_id`` + fixed-size ``signature`` (list<uint64>).
    """

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 1, text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.unique(murmur3_64_batch(sh, 0))
        with np.errstate(over="ignore"):
            perms = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(
                _MERSENNE
            )
        return perms.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), self.num_perm
                ),
            }
        )


def minhash_bands(sig_ds, bands: int = 32, id_col: str = "doc_id"):
    """Explode signatures into (band_id, band_hash, doc_id) rows."""

    def explode(batch: pa.Table) -> pa.Table:
        sigs = np.asarray(batch["signature"].combine_chunks().flatten()).reshape(
            batch.num_rows, -1
        )
        num_perm = sigs.shape[1]
        r = num_perm // bands
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # hash each band's r values to one uint64
        band_hash = np.empty((batch.num_rows, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                chunk = sigs[:, b * r : (b + 1) * r]
                acc = np.full(batch.num_rows, 1469598103934665603, dtype=np.uint64)
                for j in range(r):
                    acc = (acc ^ chunk[:, j]) * np.uint64(1099511628211)
                band_hash[:, b] = acc
        return pa.table(
            {
                "band_id": pa.array(
                    np.repeat(np.arange(bands, dtype=np.int32), batch.num_rows)
                ),
                "band_hash": pa.array(band_hash.T.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def lsh_candidate_pairs(band_ds, id_col: str = "doc_id", max_bucket: int = 64):
    """groupby (band_id, band_hash) -> within-bucket pairs (i<j).

    Buckets larger than ``max_bucket`` are truncated (logged via a column) —
    at 100 TB a giant bucket means a degenerate band (e.g. empty docs) and
    pairwise expansion there is quadratic garbage."""
    import pandas as pd

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].unique())[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"left_id": [], "right_id": []}).astype("int64")
        left, right = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                left.append(ids[i])
                right.append(ids[j])
        return pd.DataFrame({"left_id": left, "right_id": right})

    cand = band_ds.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # dedup pairs discovered by multiple bands
    return cand.groupby(["left_id", "right_id"]).count()


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard — the verifier for candidate pairs."""
    sa, sb = set(char_shingles(a, k)), set(char_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    concurrency: int = 4,
):
    """Full near-dup pipeline: signatures -> bands -> candidates -> verified
    pairs with signature-estimated Jaccard >= threshold.

    Returns a Dataset of (left_id, right_id, est_jaccard)."""
    import ray

    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=256,
    )
    sig_mat = sig_ds.take_all()  # signatures are small (id + 128*8 bytes/doc)
    sig_lookup = {
        r[id_col]: np.asarray(r["signature"], dtype=np.uint64) for r in sig_mat
    }
    sig_ref = ray.put(sig_lookup)
    band_ds = minhash_bands(
        ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(list(sig_lookup.keys())),
                    "signature": pa.FixedSizeListArray.from_arrays(
                        pa.array(
                            np.stack(list(sig_lookup.values())).reshape(-1), pa.uint64()
                        ),
                        num_perm,
                    ),
                }
            )
        ),
        bands=bands,
        id_col=id_col,
    )
    cand = lsh_candidate_pairs(band_ds, id_col=id_col)

    def verify(batch: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        lid = batch["left_id"].to_pylist()
        rid = batch["right_id"].to_pylist()
        est = [estimate_jaccard(sigs[a], sigs[b]) for a, b in zip(lid, rid)]
        out = pa.table(
            {
                "left_id": pa.array(lid, pa.int64()),
                "right_id": pa.array(rid, pa.int64()),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

    return cand.map_batches(verify, batch_format="pyarrow")


def connected_components(pairs_ds, ds_ids, id_col: str = "doc_id", max_rounds: int = 10):
    """Min-label propagation over candidate pairs -> cluster representative
    per doc. Small shuffles per round; rounds ~ graph diameter (near-dup
    clusters are tiny, so this converges in 2-3 rounds)."""
    import pandas as pd

    edges = pairs_ds.select_columns(["left_id", "right_id"]).to_pandas()
    labels = {i: i for i in ds_ids}
    for _ in range(max_rounds):
        changed = False
        for a, b in edges.itertuples(index=False):
            la, lb = labels[a], labels[b]
            if la != lb:
                m = min(la, lb)
                labels[a] = labels[b] = m
                changed = True
        if not changed:
            break
    # path-compress
    def root(x):
        while labels[x] != x:
            labels[x] = labels[labels[x]]
            x = labels[x]
        return x

    return pd.DataFrame(
        {id_col: list(labels), "cluster": [root(i) for i in labels]}
    )


def simhash_candidates(ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """SimHash near-dup: signature -> 4x16-bit band blocking -> Hamming verify.

    Two docs within Hamming distance 3 of each other share at least one of
    the four 16-bit bands (pigeonhole), so band-equality blocking is lossless
    for max_hamming <= 3."""
    from .text import simhash64

    def sig_stage(batch: pa.Table) -> pa.Table:
        sigs = simhash64(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col], "simhash": pa.array(sigs)})

    sig_ds = ds.map_batches(sig_stage, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rows = {"band_id": [], "band_val": [], id_col: [], "simhash": []}
        for b in range(4):
            band = ((sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            rows["band_id"].extend([b] * len(ids))
            rows["band_val"].extend(band.tolist())
            rows[id_col].extend(ids.tolist())
            rows["simhash"].extend(sigs.astype(np.int64).tolist())
        return pa.table(
            {
                "band_id": pa.array(rows["band_id"], pa.int32()),
                "band_val": pa.array(rows["band_val"], pa.int64()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "simhash": pa.array(rows["simhash"], pa.int64()),
            }
        )

    import pandas as pd

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        left, right, dist = [], [], []
        for i in range(len(ids)):
            x = sh[i] ^ sh[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            ok = d <= max_hamming
            left.extend([ids[i]] * int(ok.sum()))
            right.extend(ids[i + 1 :][ok].tolist())
            dist.extend(d[ok].tolist())
        return pd.DataFrame(
            {"left_id": left, "right_id": right, "hamming": dist},
            dtype="int64",
        )

    cand = (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["left_id", "right_id"]).min("hamming")
