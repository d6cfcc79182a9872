"""Distributed top-principal-component (stages/linalg.py) against
independent numpy.linalg.eigh on the same rows — both the one-pass
centered-Gram plan (d <= 512) and the power-iteration plan (forced via
max_exact_dim=0)."""

import numpy as np
import pyarrow as pa


def _planted_ds(n=400, d=12, seed=3, gap=6.0):
    """Anisotropic Gaussian: one dominant direction (eigengap ~ gap^2),
    deterministic seed, shifted mean so the centering path is exercised."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    base = rng.randn(n, d)
    X = base + gap * np.outer(rng.randn(n), direction) + 5.0
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )
    # float32 storage: the oracle must see the same quantized values
    Xq = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    return rd.from_arrow(tbl).repartition(7), Xq


def _eigh_top(X):
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc / len(X))
    v = evecs[:, -1]
    pivot = int(np.argmax(np.abs(v)))
    return (v if v[pivot] >= 0 else -v), float(evals[-1])


class TestTopPrincipalComponent:
    def test_exact_gram_plan_matches_eigh(self, ray_session):
        from sprout_ray.stages.linalg import top_principal_component

        ds, X = _planted_ds()
        v, lam, mean, n, hist = top_principal_component(ds)
        ev, el = _eigh_top(X)
        assert n == len(X)
        assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
        assert abs(np.dot(v, ev)) > 1 - 1e-9
        assert abs(lam - el) <= 1e-9 * el

    def test_power_iteration_plan_matches_on_gapped_spectrum(self, ray_session):
        from sprout_ray.stages.linalg import top_principal_component

        ds, X = _planted_ds()
        v, lam, _mean, _n, hist = top_principal_component(
            ds, max_exact_dim=0, iterations=200
        )
        ev, el = _eigh_top(X)
        assert abs(np.dot(v, ev)) > 0.9999
        assert abs(lam - el) <= 1e-4 * el
        # power-iteration invariant: Rayleigh history monotone (fp slack)
        assert all(
            b >= a - 1e-9 * max(abs(b), 1.0) for a, b in zip(hist, hist[1:])
        )

    def test_query_self_evidence(self, ray_session):
        from sprout_ray.pipelines.analytics import embedding_top_component

        out = embedding_top_component("/root/testdata/sf0.001").to_pandas()
        assert out.within_bound.all()
        assert out.rayleigh_monotone.all()
        assert float(out.residual_ratio.iloc[0]) <= 1e-6
        assert abs(np.linalg.norm(out.loading.to_numpy()) - 1.0) < 1e-6


class TestFrequentDirections:
    """kernel/fd.py — mergeable Gram sketch with tracked shed-mass bound."""

    def _planted(self, n=4000, d=48, rank=3, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d)) * 3.0 + (
            rng.normal(size=(n, d)) * 0.1
        )

    def test_guarantee_vs_exact_gram(self):
        import numpy as np

        from sprout_ray.kernel.fd import FrequentDirections

        A = self._planted()
        sk = FrequentDirections(l=24)
        for i in range(0, len(A), 333):
            sk.update_batch(A[i : i + 333])
        G = A.T @ A
        B = sk.sketch_matrix()
        ev = np.linalg.eigvalsh(G - B.T @ B)
        scale = float(np.abs(G).max())
        assert ev.min() >= -1e-9 * scale  # PSD: B^T B never overshoots
        assert ev.max() <= sk.delta + 1e-9 * scale  # tracked bound
        assert sk.delta <= 2.0 * sk.frob2 / sk.l + 1e-9 * scale  # worst case

    def test_merge_preserves_guarantee_and_counters(self):
        import numpy as np

        from sprout_ray.kernel.fd import FrequentDirections

        A = self._planted(seed=5)
        parts = np.array_split(A, 7)
        sks = []
        for p in parts:
            s = FrequentDirections(l=24)
            s.update_batch(p)
            sks.append(s)
        m = sks[0]
        for s in sks[1:]:
            m.merge(s)
        assert m.n_rows == len(A)
        assert abs(m.frob2 - float((A * A).sum())) < 1e-6 * m.frob2
        G = A.T @ A
        B = m.sketch_matrix()
        ev = np.linalg.eigvalsh(G - B.T @ B)
        scale = float(np.abs(G).max())
        assert ev.min() >= -1e-9 * scale
        assert ev.max() <= m.delta + 1e-9 * scale

    def test_degenerate_exact_below_capacity(self):
        import numpy as np

        from sprout_ray.kernel.fd import FrequentDirections

        A = self._planted(n=30, d=16, seed=2)
        parts = np.array_split(A, 3)
        sks = []
        for p in parts:
            s = FrequentDirections(l=64)
            s.update_batch(p)
            sks.append(s)
        m = sks[0]
        for s in sks[1:]:
            m.merge(s)
        assert m.delta == 0.0
        assert np.allclose(m.gram(), A.T @ A)

    def test_geometry_guard_and_roundtrip(self):
        import numpy as np
        import pytest

        from sprout_ray.kernel.fd import FrequentDirections

        a = FrequentDirections(l=8)
        a.update_batch(np.ones((4, 5)))
        b = FrequentDirections(l=16)
        b.update_batch(np.ones((4, 5)))
        with pytest.raises(ValueError, match="geometry"):
            a.merge(b)
        c = FrequentDirections(l=8)
        c.update_batch(np.ones((4, 7)))
        with pytest.raises(ValueError, match="dimension"):
            a.merge(c)
        back = FrequentDirections.from_bytes(a.to_bytes())
        assert np.allclose(back.rows, a.rows) and back.n_rows == a.n_rows

    def test_distributed_build_matches_bound(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.linalg import exact_gram, fd_build

        A = self._planted(n=2000, d=32, seed=9).astype(np.float32)
        t = pa.table({"embedding": pa.array(list(A), pa.list_(pa.float32()))})
        ds = rd.from_arrow(t).repartition(6).materialize()
        sk = fd_build(ds, l=20)
        assert sk.n_rows == 2000
        G, n_rows = exact_gram(ds)
        assert n_rows == 2000
        B = sk.sketch_matrix()
        ev = np.linalg.eigvalsh(G - B.T @ B)
        scale = float(np.abs(G).max())
        assert ev.min() >= -1e-6 * scale
        assert ev.max() <= sk.delta + 1e-6 * scale


class TestRowsMatrixGuards:
    """Round-5 ADVICE: ragged / null list columns must fail loudly, not
    silently mis-associate values across rows."""

    def test_ragged_list_raises(self):
        import pyarrow as pa
        import pytest

        from sprout_ray.kernel.fd import _rows_matrix

        # 2 rows x 6 total values: divisible, so the old reshape would
        # silently produce a (2, 3) matrix from a (4, 2) intent
        col = pa.array([[1.0, 2.0, 3.0, 4.0], [5.0, 6.0]])
        with pytest.raises(ValueError, match="ragged"):
            _rows_matrix(col)

    def test_null_rows_raise(self):
        import pyarrow as pa
        import pytest

        from sprout_ray.kernel.fd import _rows_matrix

        col = pa.array([[1.0, 2.0], None, [3.0, 4.0]])
        with pytest.raises(ValueError, match="null"):
            _rows_matrix(col)

    def test_fixed_size_list_ok(self):
        import numpy as np
        import pyarrow as pa

        from sprout_ray.kernel.fd import _rows_matrix

        col = pa.FixedSizeListArray.from_arrays(
            pa.array([1.0, 2.0, 3.0, 4.0]), 2
        )
        assert np.array_equal(_rows_matrix(col), [[1.0, 2.0], [3.0, 4.0]])

    def test_uniform_list_ok(self):
        import numpy as np
        import pyarrow as pa

        from sprout_ray.kernel.fd import _rows_matrix

        col = pa.array([[1.0, 2.0], [3.0, 4.0]])
        assert np.array_equal(_rows_matrix(col), [[1.0, 2.0], [3.0, 4.0]])
