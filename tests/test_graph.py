"""Bipartite PageRank (stages/graph.py) against an independent dense
edge-list replica — the testdata corpus is degenerate for this operator
(every user touches every type), so the planted graph here carries the
mask-diversity evidence the driver oracle can't."""

import numpy as np
import pyarrow as pa
import pytest


def _planted_ds():
    import ray.data as rd

    # users 0..9 with DIFFERENT adjacency sets over 4 types; duplicate
    # interactions on purpose (the op must distinct them), spread over
    # several blocks so per-block uniques don't equal global distinct
    rows_u, rows_t = [], []
    types = ["a", "b", "c", "d"]
    for u in range(10):
        adj = types[: 1 + (u % 4)]
        for t in adj:
            for _ in range(1 + (u + len(t)) % 3):  # planted duplicates
                rows_u.append(u)
                rows_t.append(t)
    tbl = pa.table(
        {
            "user_id": pa.array(rows_u, pa.int64()),
            "event_type": pa.array(rows_t, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(5), types


def _dense_replica(edges, n_iters=3, total=10**12, damp=85):
    """Textbook edge-list power iteration in integer units (structured
    deliberately unlike the engine: explicit per-edge loop)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    n = len(nodes)
    base = total // n
    tele = 15 * base // 100
    s = {v: base for v in nodes}
    for _ in range(n_iters):
        agg = {v: 0 for v in nodes}
        for src, dst in edges:
            agg[dst] += s[src] // deg[src]
        s = {v: tele + damp * agg[v] // 100 for v in nodes}
    return s


class TestBipartitePagerank:
    def test_planted_skewed_graph_matches_dense_replica(self, ray_session):
        from sprout_ray.stages.graph import bipartite_pagerank

        ds, types = _planted_ds()
        state, type_scores, vocab, type_deg, n_nodes = bipartite_pagerank(
            ds, "user_id", "event_type", iterations=3
        )
        assert list(vocab) == types  # sorted ascending

        # independent replica over the DISTINCT edge set, both directions;
        # type node ids mirror the engine's -(rank) convention
        edges = set()
        for u in range(10):
            for j, t in enumerate(types[: 1 + (u % 4)]):
                edges.add((u, -(j + 1)))
                edges.add((-(j + 1), u))
        expect = _dense_replica(sorted(edges))

        got_users = {int(r["uid"]): int(r["s"]) for r in state.take_all()}
        assert got_users == {u: expect[u] for u in range(10)}
        for j in range(len(types)):
            assert int(type_scores[j]) == expect[-(j + 1)]
        # degrees: type j is adjacent to users with u % 4 >= j
        assert [int(x) for x in type_deg] == [10, 7, 4, 2]
        assert n_nodes == 14
        # mass sanity: scores are positive shares of the 1e12 pool
        assert all(v > 0 for v in got_users.values())

    def test_right_vocab_budget_guard(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.graph import bipartite_pagerank

        tbl = pa.table(
            {
                "user_id": pa.array([0] * 70, pa.int64()),
                "event_type": pa.array([f"t{i:02d}" for i in range(70)]),
            }
        )
        with pytest.raises(ValueError, match="adjacency-mask budget"):
            bipartite_pagerank(rd.from_arrow(tbl))

    def test_degree_histogram_planted(self, ray_session, tmp_path):
        import shutil

        from sprout_ray.pipelines.analytics import user_type_degree_histogram

        ds, _types = _planted_ds()
        sf = tmp_path / "sf"
        sf.mkdir()
        ds.write_parquet(str(sf / "events.parquet"))
        out = user_type_degree_histogram(str(sf)).to_pandas()
        # u%4==0 -> deg1 (u=0,4,8), ==1 -> deg2 (1,5,9), ==2 -> deg3 (2,6),
        # ==3 -> deg4 (3,7)
        assert dict(zip(out["degree"], out["n_users"])) == {1: 3, 2: 3, 3: 2, 4: 2}
        shutil.rmtree(sf)
