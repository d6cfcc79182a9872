"""Full bench-suite sweep at sf0.1 — the driver bench's exact data scale.

Round 4's `moments_by_type` guard passed the sf0.01 correctness gate but
crashed on sf0.1's wider value tail and zeroed BENCH_r04.json; this test
would have caught it before the driver did.  It is opt-in (10+ min at the
4-CPU test session):

    SPROUT_SWEEP_SF01=1 python -m pytest tests/test_sf01_sweep.py -q

For the even wider all-197-registry sweep use
``python tools/sweep_queries.py /root/testdata/sf0.1`` (32 CPUs, writes
artifacts/sweep_sf0.1.json).
"""

import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("SPROUT_SWEEP_SF01"),
    reason="opt-in: SPROUT_SWEEP_SF01=1 (full sf0.1 suite, 10+ min at 4 CPUs)",
)
def test_full_query_suite_at_sf01_raises_nothing(ray_session):
    import bench

    out = bench.query_suite("/root/testdata/sf0.1")
    errors = {k: v for k, v in out.items() if not isinstance(v, (int, float))}
    assert not errors, errors
