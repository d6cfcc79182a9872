"""ScalableBloomFilter reference-semantics tests.

Mirrors /root/reference/scalable_bloom_test.go: growth without error
(53-81), width schedule (83-130); plus the compound-FPR bound
(scalable_bloom.go:213-219) and the level-aligned distributed merge that the
reference lacks (SURVEY.md §2.2 #17).
"""

import math
import random

import pytest

from sprout_ray.kernel import (
    BloomFilter,
    BloomMergeError,
    ScalableBloomFilter,
)


def test_grow_10x_no_error_and_membership():
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=100)
    keys = [str(i).encode() for i in range(1000)]
    sbf.add_batch(keys)
    assert sbf.count() == 1000
    assert sbf.capacity() >= 1000
    assert len(sbf.filters) > 1
    assert sbf.contains(b"0")  # earliest key still found
    assert sbf.contains_batch(keys).all()


def test_growth_schedule_matches_reference():
    # scalable_bloom.go:161: err_i = err0 * 0.9^i
    # scalable_bloom.go:174-178: cap_i = int(m0 * s^(i-1) * ln 2)
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=100, growth_rate=2)
    m0 = sbf.m0
    sbf.add_batch([str(i).encode() for i in range(2000)])
    for i, f in enumerate(sbf.filters[1:], start=1):
        assert f.err_rate == pytest.approx(0.01 * 0.9**i)
        assert f.capacity == max(int(m0 * 2 ** (i - 1) * math.log(2)), 11)


def test_pre_growth_width_equals_fixed_filter():
    # scalable_bloom_test.go:83-130
    bf = BloomFilter(err_rate=0.01, capacity=1000)
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=1000)
    assert sbf.filter_size() == bf.bit_width
    sbf.add_batch([str(i).encode() for i in range(3000)])
    assert len(sbf.filters) > 1


def test_growth_rate_4():
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=100, growth_rate=4)
    sbf.add_batch([str(i).encode() for i in range(3000)])
    m0 = sbf.m0
    for i, f in enumerate(sbf.filters[1:], start=1):
        assert f.capacity == max(int(m0 * 4 ** (i - 1) * math.log(2)), 11)
    assert sbf.contains_batch([str(i).encode() for i in range(3000)]).all()


def test_no_false_negatives_across_growth():
    rng = random.Random(3)
    keys = list({bytes(rng.randrange(256) for _ in range(10)) for _ in range(5000)})
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=100)
    sbf.add_batch(keys)
    assert sbf.contains_batch(keys).all()


def test_compound_prob_bound_and_empirical_fpr():
    # add 50x initial capacity; bound = sum form <= err0/(1-r) = 10*err0
    err0 = 0.01
    sbf = ScalableBloomFilter(err_rate=err0, initial_capacity=100)
    sbf.add_batch([f"in-{i}".encode() for i in range(5000)])
    bound = sbf.prob()
    assert bound <= err0 / (1 - sbf.ratio)
    probes = [f"out-{i}".encode() for i in range(100_000)]
    fpr = int(sbf.contains_batch(probes).sum()) / len(probes)
    assert fpr <= bound + 3 * math.sqrt(bound / len(probes)), (fpr, bound)


def test_merge_level_aligned():
    spec = dict(err_rate=0.01, initial_capacity=100)
    a = ScalableBloomFilter(**spec)
    b = ScalableBloomFilter(**spec)
    a.add_batch([f"a-{i}".encode() for i in range(500)])
    b.add_batch([f"b-{i}".encode() for i in range(800)])
    a.merge(b)
    assert a.count() == 1300
    assert a.contains_batch([f"a-{i}".encode() for i in range(500)]).all()
    assert a.contains_batch([f"b-{i}".encode() for i in range(800)]).all()


def test_merge_associative_commutative_bitwise():
    spec = dict(err_rate=0.01, initial_capacity=100)
    sets = [
        [f"{tag}-{i}".encode() for i in range(n)]
        for tag, n in (("x", 300), ("y", 450), ("z", 700))
    ]

    def build(order):
        acc = ScalableBloomFilter(**spec)
        for j in order:
            p = ScalableBloomFilter(**spec)
            p.add_batch(sets[j])
            acc.merge(p)
        return acc

    f1, f2 = build([0, 1, 2]), build([2, 1, 0])
    assert len(f1.filters) == len(f2.filters)
    for x, y in zip(f1.filters, f2.filters):
        assert (x.bits == y.bits).all()
    assert f1.count() == f2.count() == 1450


def test_merge_spec_mismatch_raises():
    a = ScalableBloomFilter(err_rate=0.01, initial_capacity=100)
    b = ScalableBloomFilter(err_rate=0.001, initial_capacity=100)
    with pytest.raises(BloomMergeError):
        a.merge(b)


def test_clear_and_serialize_roundtrip():
    sbf = ScalableBloomFilter(err_rate=0.01, initial_capacity=100)
    sbf.add_batch([str(i).encode() for i in range(1000)])
    clone = ScalableBloomFilter.from_bytes(sbf.to_bytes())
    assert clone.count() == 1000
    assert len(clone.filters) == len(sbf.filters)
    assert clone.contains_batch([str(i).encode() for i in range(1000)]).all()
    sbf.clear()
    assert sbf.count() == 0 and len(sbf.filters) == 1
    assert not sbf.contains(b"5")


def test_validation():
    with pytest.raises(ValueError):
        ScalableBloomFilter(err_rate=0.01, initial_capacity=0)
    with pytest.raises(ValueError):
        ScalableBloomFilter(err_rate=2.0, initial_capacity=100)
    with pytest.raises(ValueError):
        ScalableBloomFilter(err_rate=0.01, initial_capacity=100, growth_rate=3)
