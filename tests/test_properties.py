"""Hypothesis property tests for the mergeable-summary kernels (no Ray).

The distributed engine's correctness rests on two algebraic facts per
sketch: (1) the single-pass bounds hold for ANY input, (2) merging
arbitrary partial splits preserves them (associativity is what makes the
tree merges in stages/builder.py legal). Randomized splits + adversarial
key multisets probe exactly those.
"""

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sprout_ray.kernel.kmv import KMVSketch
from sprout_ray.kernel.misragries import MisraGries

keys_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=400
)


@settings(max_examples=60, deadline=None)
@given(keys=keys_strategy, m=st.integers(min_value=1, max_value=32))
def test_mg_bounds_any_input(keys, m):
    mg = MisraGries(m=m)
    mg.update_batch(np.asarray(keys, dtype=object)) if keys else None
    true = Counter(keys)
    assert mg.total == len(keys)
    # deterministic interval per tracked key; decrement budget bound
    assert mg.err_bound * (m + 1) <= len(keys)
    for k, c in mg.counts.items():
        assert c <= true[k] <= c + mg.err_bound
    # guarantee: heavy keys are never evicted
    for k, c in true.items():
        if c > len(keys) / (m + 1):
            assert k in mg.counts


@settings(max_examples=60, deadline=None)
@given(
    keys=keys_strategy,
    m=st.integers(min_value=1, max_value=32),
    splits=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
)
def test_mg_merged_splits_keep_bounds(keys, m, splits):
    cuts = sorted({s for s in splits if s < len(keys)})
    parts, prev = [], 0
    for c in cuts + [len(keys)]:
        p = MisraGries(m=m)
        if keys[prev:c]:
            p.update_batch(np.asarray(keys[prev:c], dtype=object))
        parts.append(p)
        prev = c
    acc = MisraGries.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        acc.merge(MisraGries.from_bytes(p.to_bytes()))
    true = Counter(keys)
    assert acc.total == len(keys)
    assert acc.err_bound * (m + 1) <= len(keys)
    for k, c in acc.counts.items():
        assert c <= true[k] <= c + acc.err_bound
    for k, c in true.items():
        if c > len(keys) / (m + 1):
            assert k in acc.counts


@settings(max_examples=60, deadline=None)
@given(
    keys=keys_strategy,
    k=st.integers(min_value=2, max_value=64),
    splits=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
)
def test_kmv_merge_equals_single_pass(keys, k, splits):
    import pyarrow as pa

    single = KMVSketch(k=k)
    if keys:
        single.update_batch(pa.array(keys))
    cuts = sorted({s for s in splits if s < len(keys)})
    parts, prev = [], 0
    for c in cuts + [len(keys)]:
        p = KMVSketch(k=k)
        if keys[prev:c]:
            p.update_batch(pa.array(keys[prev:c]))
        parts.append(p)
        prev = c
    acc = KMVSketch.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        acc.merge(KMVSketch.from_bytes(p.to_bytes()))
    # bottom-k of a union is determined by the unions of bottom-k sets:
    # any split merges to EXACTLY the single-pass state
    assert np.array_equal(acc.hashes, single.hashes)
    assert acc.keys == single.keys
    n_distinct = len(set(keys))
    if n_distinct < k:
        assert acc.is_exact() and acc.estimate() == float(n_distinct)
        assert sorted(acc.sample()) == sorted(set(keys))


@given(
    keys=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=2000),
    splits=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=40, deadline=None)
def test_bloom_cardinality_merge_invariant(keys, splits):
    """approx_cardinality is split/merge-order invariant (bit-OR is the
    state) and tracks the true distinct count within the fill-ratio
    estimator's accuracy at these fills (+2 absolute discrete floor)."""
    from sprout_ray.kernel.bloom import BloomFilter

    strs = [f"k{v}" for v in keys]
    single = BloomFilter(err_rate=0.01, capacity=10_000)
    if strs:
        single.add_batch(strs)
    parts = []
    chunk = max(1, len(strs) // splits)
    for i in range(0, len(strs), chunk):
        bf = BloomFilter(err_rate=0.01, capacity=10_000)
        bf.add_batch(strs[i : i + chunk])
        parts.append(bf)
    merged = BloomFilter(err_rate=0.01, capacity=10_000)
    for bf in reversed(parts):  # reverse order: merge is commutative
        merged.merge(bf)
    assert merged.set_bit_count() == single.set_bit_count()
    est = merged.approx_cardinality()
    exact = len(set(keys))
    assert abs(est - exact) <= max(0.02 * exact, 2.0)


class TestMortonZorder:
    def test_interleave_exact_bits(self):
        """morton_key(x, y) places x's bit i at position 2i and y's at
        2i+1 — checked against a direct per-bit reference."""
        import numpy as np

        from sprout_ray.functions.zorder import MAX_COORD, morton_key

        rng = np.random.RandomState(7)
        x = rng.randint(0, MAX_COORD + 1, size=500).astype(np.int64)
        y = rng.randint(0, MAX_COORD + 1, size=500).astype(np.int64)
        got = morton_key(x, y)
        ref = np.zeros(500, dtype=np.int64)
        for i in range(31):
            ref |= ((x >> i) & 1) << (2 * i)
            ref |= ((y >> i) & 1) << (2 * i + 1)
        assert (got == ref).all()
        assert (got >= 0).all()  # bit 63 never set

    def test_locality_monotone_in_each_dim(self):
        """With the other coordinate fixed, the key is strictly monotone
        in each dimension (the property block-range pruning relies on)."""
        import numpy as np

        from sprout_ray.functions.zorder import morton_key

        xs = np.arange(1000, dtype=np.int64)
        fixed = np.full(1000, 12345, dtype=np.int64)
        assert (np.diff(morton_key(xs, fixed)) > 0).all()
        assert (np.diff(morton_key(fixed, xs)) > 0).all()

    def test_coord_range_guard(self):
        import numpy as np
        import pytest

        from sprout_ray.functions.zorder import morton_key

        bad = np.array([1 << 31], dtype=np.int64)
        ok = np.array([0], dtype=np.int64)
        with pytest.raises(ValueError, match="rescale or"):
            morton_key(bad, ok)
        with pytest.raises(ValueError, match="rescale or"):
            morton_key(ok, -ok - 1)

    def test_sql_twin_same_bits(self):
        """The DuckDB expression evaluates the identical spread — byte
        parity on random coordinates."""
        import duckdb
        import numpy as np

        from sprout_ray.functions.zorder import MAX_COORD, morton_key, morton_key_sql

        rng = np.random.RandomState(11)
        x = rng.randint(0, MAX_COORD + 1, size=200).astype(np.int64)
        y = rng.randint(0, MAX_COORD + 1, size=200).astype(np.int64)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"x": x, "y": y}))
        sql = morton_key_sql("x", "y")
        got = con.execute(f"SELECT {sql} AS z FROM t").fetchnumpy()["z"]
        assert (got.astype(np.int64) == morton_key(x, y)).all()


class TestMomentsPartialProducts:
    """Property: the round-5 int64-safe partial-product construction
    (kernel/moments.power_parts + the hi/lo-split sums) equals bignum
    brute force for ANY int64 batch within |c| <= 2^31 - 1, including
    adversarial boundary clusters hypothesis likes to find."""

    @given(
        vals=st.lists(
            st.integers(min_value=-(2**31 - 1), max_value=2**31 - 1),
            min_size=1,
            max_size=300,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_update_batch_exact(self, vals):
        from sprout_ray.kernel.moments import MomentsSketch

        c = np.array(vals, dtype=np.int64)
        sk = MomentsSketch()
        sk.update_batch(c)
        assert sk.s1 == sum(int(v) for v in vals)
        assert sk.s2 == sum(int(v) ** 2 for v in vals)
        assert sk.s3 == sum(int(v) ** 3 for v in vals)
        assert sk.s4 == sum(int(v) ** 4 for v in vals)

    @given(
        parts=st.lists(
            st.lists(
                st.integers(min_value=-(2**31 - 1), max_value=2**31 - 1),
                min_size=1,
                max_size=60,
            ),
            min_size=2,
            max_size=6,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_merge_equals_whole(self, parts):
        from sprout_ray.kernel.moments import MomentsSketch

        whole = MomentsSketch()
        whole.update_batch(np.array(sum(parts, []), dtype=np.int64))
        acc = MomentsSketch()
        for p in parts:
            s = MomentsSketch()
            s.update_batch(np.array(p, dtype=np.int64))
            acc.merge(s)
        assert acc.result() == whole.result()


class TestRangeBoundariesProperty:
    """Property: range_boundaries == SQL percentile_disc for ANY integer
    multiset (ties, negatives, singletons) and any power-of-two k —
    the rule events_range_layout and customer_rfm_segments both ride."""

    @given(
        vals=st.lists(
            st.integers(min_value=-50, max_value=50), min_size=1, max_size=400
        ),
        k=st.sampled_from([2, 4, 8]),
    )
    @settings(max_examples=40, deadline=None)
    def test_matches_percentile_disc(self, ray_session, vals, k):
        import duckdb
        import pyarrow as pa

        import ray.data as rd
        from sprout_ray.stages.layout import range_boundaries

        ds = rd.from_arrow(
            pa.table({"v": pa.array(np.array(vals, dtype=np.int64))})
        )
        got = range_boundaries(ds, "v", k).tolist()
        con = duckdb.connect()
        con.register("t", pa.table({"v": pa.array(np.array(vals, np.int64))}))
        want = [
            con.execute(
                f"SELECT percentile_disc({i}.0/{k}) WITHIN GROUP (ORDER BY v) FROM t"
            ).fetchone()[0]
            for i in range(1, k)
        ]
        assert got == want, (vals, k)
