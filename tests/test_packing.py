"""Sequence packing (stages/sampling.pack_sequences): the two-pass
distributed prefix scan must match a single-process numpy scan regardless
of block layout."""

import numpy as np
import pyarrow as pa
import pytest

from sprout_ray.stages.sampling import pack_sequences


def _reference_bins(ids, toks, capacity):
    order = np.argsort(ids)
    before = np.concatenate([[0], np.cumsum(np.asarray(toks)[order])[:-1]])
    return dict(zip(np.asarray(ids)[order].tolist(), (before // capacity).tolist()))


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    ids = rng.permutation(500).astype(np.int64)  # unsorted input
    toks = rng.randint(0, 90, size=500).astype(np.int64)  # zeros included
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "token_count": pa.array(toks)})
    )
    return ds, ids, toks


class TestPackSequences:
    @pytest.mark.parametrize("nblocks", [1, 7])
    def test_matches_numpy_scan_across_block_layouts(self, corpus, nblocks):
        ds, ids, toks = corpus
        packed = pack_sequences(
            ds.repartition(nblocks), capacity=128
        ).to_pandas()
        got = dict(zip(packed["doc_id"], packed["bin"]))
        assert got == _reference_bins(ids, toks, 128)

    def test_monotone_and_exhaustive(self, corpus):
        ds, ids, toks = corpus
        packed = pack_sequences(ds.repartition(5), capacity=64).to_pandas()
        b = packed.sort_values("doc_id")["bin"].to_numpy()
        assert (np.diff(b) >= 0).all()  # bins non-decreasing in id order
        assert b[0] == 0
        assert b[-1] == int(toks[np.argsort(ids)][:-1].sum()) // 64

    def test_capacity_validation(self, corpus):
        ds, _, _ = corpus
        with pytest.raises(ValueError):
            pack_sequences(ds, capacity=0)

    def test_giant_doc_spans_bins(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "token_count": pa.array([10, 1000, 10], pa.int64()),
                }
            )
        )
        packed = pack_sequences(ds, capacity=100).to_pandas()
        got = dict(zip(packed["doc_id"], packed["bin"]))
        # doc 2 starts in bin 0; doc 3 starts at offset 1010 -> bin 10
        assert got == {1: 0, 2: 0, 3: 10}
