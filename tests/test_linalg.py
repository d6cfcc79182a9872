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
