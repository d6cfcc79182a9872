"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is broadcast once (``ray.put``)
  and every batch does one numpy matmul; per-block top-k partials are merged
  on the driver (a k-row reduce, not a data shuffle).
- LSH-bucketed variant (random hyperplanes): each row gets a bucket id;
  probing only scans matching buckets — the scale path when the corpus is
  large and queries are many.
- Embedding near-duplicate detection: cosine >= threshold pairs via the same
  bucket blocking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _emb_matrix(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # empty chunked edge
        return np.empty((0, 0), dtype=np.float32)
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    if len(arr) == 0:
        return flat.reshape(0, 0)
    dim = len(flat) // len(arr)
    return flat.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class CosineTopK:
    """Actor-pool stage: per-block top-k cosine scores against broadcast queries.

    Emits (query_id, doc id, score) partial top-k rows per block; merge with
    ``merge_topk`` on the driver."""

    def __init__(self, queries_ref, k: int, emb_col: str = "embedding", id_col: str = "vec_id"):
        q = ray.get(queries_ref)
        self.q = _normalize(np.asarray(q, dtype=np.float32))
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = emb @ self.q.T  # (B, Q)
        k = min(self.k, scores.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[1]):
            top = np.argpartition(-scores[:, qi], k - 1)[:k] if k else np.empty(0, int)
            for t in top:
                out_q.append(qi)
                out_id.append(int(ids[t]))
                out_s.append(float(scores[t, qi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def ann_topk(ds, queries: np.ndarray, k: int = 10, emb_col: str = "embedding", id_col: str = "vec_id", concurrency: int = 4):
    """Brute-force exact cosine top-k (the correctness baseline for ANN)."""
    ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={
            "queries_ref": ref,
            "k": k,
            "emb_col": emb_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    import pandas as pd

    df = pd.DataFrame(partials)
    if df.empty:
        return df
    return (
        df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )


class HyperplaneLSH:
    """Random-hyperplane signatures: bucket id = sign-bit pattern of n_planes
    projections. Cosine-similar vectors collide with high probability."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        weights = 1 << np.arange(bits.shape[1], dtype=np.int64)
        return bits @ weights


def add_lsh_bucket(ds, dim: int, n_planes: int = 16, seed: int = 7, emb_col: str = "embedding"):
    """Append an LSH ``bucket`` column; downstream groupby("bucket") blocks
    candidate comparisons to colliding vectors only."""
    lsh_ref = ray.put(HyperplaneLSH(dim, n_planes, seed))

    def stage(batch: pa.Table) -> pa.Table:
        lsh = ray.get(lsh_ref)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        return batch.append_column("bucket", pa.array(lsh.bucket(emb), type=pa.int64()))

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


class IVFIndex:
    """Inverted-file coarse quantizer for ANN (the scale path beside LSH).

    ``nlist`` centroids are trained with a few Lloyd iterations on a seeded
    sample (driver side — centroids are tiny); every vector is assigned to
    its nearest centroid's bucket inside ``map_batches``; a query scans only
    its ``nprobe`` nearest buckets. Bucket assignment is the partitioning
    key at scale: co-locating a bucket's vectors turns top-k into a
    per-bucket local matmul + a k-row merge.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float32))

    @classmethod
    def train(cls, sample: np.ndarray, nlist: int = 16, iters: int = 10, seed: int = 11) -> "IVFIndex":
        rng = np.random.default_rng(seed)
        x = _normalize(np.asarray(sample, dtype=np.float32))
        cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
        for _ in range(iters):
            assign = (x @ cent.T).argmax(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize(cent)
        return cls(cent)

    def assign(self, m: np.ndarray) -> np.ndarray:
        return (_normalize(m) @ self.centroids.T).argmax(axis=1)

    def probe_lists(self, queries: np.ndarray, nprobe: int) -> np.ndarray:
        scores = _normalize(queries) @ self.centroids.T
        return np.argsort(-scores, axis=1)[:, :nprobe]


def add_ivf_bucket(ds, index: IVFIndex, emb_col: str = "embedding"):
    """Append the IVF bucket id column (broadcast centroids, one matmul/batch)."""
    idx_ref = ray.put(index)

    def stage(batch: pa.Table) -> pa.Table:
        ivf = ray.get(idx_ref)
        emb = _emb_matrix(batch[emb_col])
        return batch.append_column(
            "ivf_bucket", pa.array(ivf.assign(emb).astype(np.int64))
        )

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 2048,
    concurrency: int = 2,
):
    """Approximate cosine top-k scanning only ``nprobe`` IVF buckets per query.

    Recall < 1.0 by design (vectors in unprobed buckets are missed); raise
    ``nprobe`` toward ``nlist`` to trade speed for exactness. Returns the
    same (query_id, id, score) frame as :func:`ann_topk`."""
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.stack(
        [np.asarray(r[emb_col], dtype=np.float32) for r in sample_rows]
    )
    index = IVFIndex.train(sample, nlist=nlist)
    q = np.asarray(queries, dtype=np.float32)
    probe = index.probe_lists(q, nprobe)  # (Q, nprobe)
    wanted = np.unique(probe)
    bucketed = add_ivf_bucket(ds, index, emb_col=emb_col)
    pruned = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["ivf_bucket"], value_set=pa.array(wanted))
        ),
        batch_format="pyarrow",
    )
    qref = ray.put(q)
    probe_ref = ray.put(probe)
    partials = pruned.map_batches(
        _IVFTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "probe_ref": probe_ref,
            "k": k,
            "emb_col": emb_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    import pandas as pd

    df = pd.DataFrame(partials)
    if df.empty:
        return df
    return (
        df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )


class _IVFTopK:
    """Per-block top-k where each query only scores rows in ITS probed
    buckets (the per-query mask rides with the stage, not the driver)."""

    def __init__(self, queries_ref, probe_ref, k, emb_col, id_col):
        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float32))
        self.probe = [set(row.tolist()) for row in ray.get(probe_ref)]
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        buckets = batch["ivf_bucket"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            mask = np.isin(buckets, list(self.probe[qi]))
            if not mask.any():
                continue
            scores = emb[mask] @ self.q[qi]
            kk = min(self.k, scores.shape[0])
            top = np.argpartition(-scores, kk - 1)[:kk]
            sel_ids = ids[mask]
            for t in top:
                out_q.append(qi)
                out_id.append(int(sel_ids[t]))
                out_s.append(float(scores[t]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def embedding_near_dup_pairs(ds, threshold: float = 0.95, emb_col: str = "embedding", id_col: str = "vec_id", n_planes: int = 8, dim: int | None = None):
    """Cosine >= threshold pairs via LSH-bucket blocking + in-bucket verify."""
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    bucketed = add_lsh_bucket(ds, dim, n_planes=n_planes, emb_col=emb_col)
    import pandas as pd

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        emb = _normalize(np.stack(group[emb_col].to_numpy()).astype(np.float32))
        s = emb @ emb.T
        left, right, score = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if s[i, j] >= threshold:
                    a, b = int(ids[i]), int(ids[j])
                    left.append(min(a, b))
                    right.append(max(a, b))
                    score.append(round(float(s[i, j]), 6))
        return pd.DataFrame({"left_id": left, "right_id": right, "cosine": score})

    return (
        bucketed.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["left_id", "right_id"])
        .max("cosine")
    )
