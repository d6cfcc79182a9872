"""Bloom-guarded KV store (reference Put/Get pattern, bloom.go:190-236)."""

import pyarrow as pa


def _build(tmp_path, n=2_000, buckets=8):
    import ray.data as rd

    from sprout_ray.state.kv import KVStore

    t = pa.table(
        {
            "k": pa.array([f"key-{i}" for i in range(n)]),
            "v": pa.array([f"value-{i}" for i in range(n)]),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    return KVStore.build(
        ds, key_col="k", value_col="v", path=str(tmp_path / "kv"), n_buckets=buckets
    )


def test_kv_get_round_trip(ray_session, tmp_path):
    store = _build(tmp_path)
    got = store.get([f"key-{i}" for i in (0, 17, 999, 1999)])
    assert got == {f"key-{i}": f"value-{i}" for i in (0, 17, 999, 1999)}


def test_kv_absent_keys_omitted_and_prune_io(ray_session, tmp_path):
    from sprout_ray.state.kv import KVStore

    store = _build(tmp_path)
    # reopen from disk: manifest + reference-layout bloom files round-trip
    store = KVStore.open(str(tmp_path / "kv"))
    present = [f"key-{i}" for i in range(10)]
    absent = [f"nope-{i}" for i in range(1_000)]
    got = store.get(absent)
    assert got == {}  # reference Get returns nil on definite miss
    # bloom pruning: absent probes read (almost) no buckets
    io = store.io_stats(absent)
    assert io["buckets_read"] <= 1  # eps=0.001 over 1000 probes: ~1 FP max
    assert store.io_stats(present)["buckets_read"] >= 1
    mixed = store.get(present + absent)
    assert mixed == {k: k.replace("key", "value") for k in present}


def test_kv_empty_probe(ray_session, tmp_path):
    store = _build(tmp_path, n=50, buckets=4)
    assert store.get([]) == {}
