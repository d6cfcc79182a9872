"""Round-5 regression coverage for the widened moments range.

Round 4's `moments_by_type` guarded |cents| <= 55108 and crashed on
sf0.1's legitimate $560.21 values (BENCH_r04 rc=1).  The kernel now
builds c^3/c^4 from int64-safe partial products (kernel/moments.
power_parts), widening the per-element bound to |c| <= 2^31 - 1; these
tests plant exactly the regimes the sf testdata cannot hit: the old
crash magnitude, near-2^31 magnitudes, and the post-hoc 2^127
total-range certificate.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sprout_ray.pipelines.analytics as A


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _write_events(tmp_path, values_dollars, types=None):
    n = len(values_dollars)
    t = pa.table(
        {
            "event_type": pa.array(
                types if types is not None else ["click"] * n, pa.string()
            ),
            "value": pa.array(np.asarray(values_dollars, dtype=np.float64)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return t


def _oracle(tmp_path):
    from __ray_entry__ import oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    return (
        con.execute(oracle_sql()["moments_by_type"])
        .fetch_arrow_table()
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def test_wide_values_match_oracle_exactly(tmp_path):
    """Values far past the old $551.08 ceiling (incl. sf0.1's killer
    magnitude and near-2^31 cents) stay bit-exact vs the DuckDB twin."""
    rng = np.random.default_rng(42)
    vals = list(rng.uniform(-100_000.0, 100_000.0, size=400))
    vals += [560.21, -560.21, 5602.10, 0.0]
    types = [f"t{i % 4}" for i in range(len(vals))]
    # absolute-max magnitudes get their own tiny group: n*max|c|^4 must
    # stay under the certified 2^127 (n < 8 at |c| = 2^31 - 1)
    vals += [21_474_836.47, -21_474_836.47, 10_000_000.0, 1.0]
    types += ["xmax"] * 4
    _write_events(tmp_path, vals, types)
    got = (
        A.moments_by_type(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = _oracle(tmp_path)
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        if got[col].dtype == object:
            assert (got[col] == want[col]).all(), col
        else:
            # exact equality: integer sums are exact on both sides and the
            # float64 expression trees are mirrored token-for-token
            assert np.array_equal(
                got[col].to_numpy(), want[col].to_numpy()
            ), col


def test_sf01_magnitude_no_longer_raises():
    """The exact round-4 failure: the driver bench's own sf0.1 data."""
    out = A.moments_by_type("/root/testdata/sf0.1").to_pandas()
    assert len(out) > 0 and int(out["max_c"].max()) > 55108


def test_total_range_certificate_is_loud(tmp_path):
    """8+ rows at the absolute-max magnitude push n*max|c|^4 past 2^127;
    the plan must refuse loudly (prep limb overflow or the finisher's
    certify_total_range), never wrap silently."""
    _write_events(tmp_path, [21_474_836.47] * 12)
    # Ray Data re-wraps user exceptions (RayTaskError(UserCodeException)),
    # so match on the message rather than the ValueError subclass
    with pytest.raises(Exception, match="rescale|2\\^127"):
        A.moments_by_type(str(tmp_path)).to_pandas()


def test_cents_past_int32_raise(tmp_path):
    _write_events(tmp_path, [30_000_000.0])  # 3e9 cents > 2^31 - 1
    with pytest.raises(Exception, match="rescale"):
        A.moments_by_type(str(tmp_path)).to_pandas()


class TestKernelWideRange:
    def test_exact_at_new_maxc(self):
        from sprout_ray.kernel.moments import MAXC, MomentsSketch

        assert MAXC == 2**31 - 1
        vals = np.array([MAXC, -MAXC, MAXC - 1, 56021, -56021, 1], np.int64)
        sk = MomentsSketch()
        sk.update_batch(vals)
        assert sk.s4 == sum(int(v) ** 4 for v in vals)
        assert sk.s3 == sum(int(v) ** 3 for v in vals)

    def test_nulls_dropped_not_wrapped(self):
        from sprout_ray.kernel.moments import MomentsSketch

        sk = MomentsSketch()
        sk.update_batch(pa.chunked_array([[5, None], [None, 7]], pa.int64()))
        assert (sk.n, sk.s1, sk.s2) == (2, 12, 74)

    def test_nonfinite_floats_loud(self):
        from sprout_ray.kernel.moments import MomentsSketch

        with pytest.raises(ValueError, match="non-finite"):
            MomentsSketch().update_batch(np.array([1.0, np.nan]))

    def test_certify_total_range(self):
        from sprout_ray.kernel.moments import certify_total_range

        certify_total_range(10**9, -56021, 56021)
        with pytest.raises(ValueError, match="rescale"):
            # (2^31 - 1)^4 is a hair under 2^124, so 8 rows still fit — 9 do not
            certify_total_range(9, -(2**31 - 1), 2**31 - 1)


class TestMomentsGroupedAndCLI:
    """Round-5 VERDICT #6: moments through the same grouped-aggregate and
    CLI build/resume surfaces as every other sketch kind."""

    def test_build_grouped_matches_sql_exactly(self):
        import duckdb

        from sprout_ray.kernel.sketch import SketchSpec
        from sprout_ray.stages.builder import build_grouped

        import ray.data as rd

        ds = rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["lang", "n_chars"],
        )
        rows = build_grouped(
            ds,
            SketchSpec.of("moments"),
            on="n_chars",
            key="lang",
            finalizer=lambda s: {
                "n": s.n, "s1": s.s1, "s2": s.s2, "s3": s.s3, "s4": s.s4,
            },
            alias="m",
        ).take_all()
        got = {r["lang"]: r["m"] for r in rows}
        con = duckdb.connect()
        want = con.execute(
            "SELECT lang, count(*), sum(n_chars), "
            "sum(CAST(n_chars AS HUGEINT) * n_chars), "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars), "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars) "
            "FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
            "GROUP BY lang"
        ).fetchall()
        assert len(want) == len(got)
        for lang, n, s1, s2, s3, s4 in want:
            m = got[lang]
            assert (m["n"], m["s1"], m["s2"], m["s3"], m["s4"]) == (
                n, int(s1), int(s2), int(s3), int(s4)
            ), lang

    def test_cli_build_resume_stats(self, tmp_path):
        import json as j
        import subprocess as sp
        import sys

        ck = str(tmp_path / "ck_moments")
        cmd = [
            sys.executable, "-m", "sprout_ray.cli", "build",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--on", "n_chars", "--sketch", "moments",
            "--ckpt", ck, "--num-cpus", "2",
        ]
        r = sp.run(cmd, capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        out = j.loads(r.stdout.strip().splitlines()[-1])
        assert out["metrics"]["built"] >= 1 and out["metrics"]["resumed"] == 0
        import duckdb

        n, s1, s4 = duckdb.connect().execute(
            "SELECT count(*), sum(n_chars), "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars) "
            "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchone()
        assert out["result"]["n"] == n and out["result"]["sum"] == int(s1)
        assert out["result"]["sum4"] == int(s4)
        # resume: all partitions skipped, identical exact result
        r2 = sp.run(
            [c if c != "build" else "resume" for c in cmd],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        out2 = j.loads(r2.stdout.strip().splitlines()[-1])
        assert out2["metrics"]["built"] == 0 and out2["metrics"]["resumed"] >= 1
        assert out2["result"] == out["result"]
        # stats readout over the checkpoint dir
        r3 = sp.run(
            [sys.executable, "-m", "sprout_ray.cli", "stats", "--ckpt", ck,
             "--num-cpus", "2"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r3.returncode == 0, r3.stderr[-2000:]
        assert j.loads(r3.stdout.strip().splitlines()[-1])["sum4"] == int(s4)


def test_grouped_pipeline_partial_product_sums_cannot_wrap(tmp_path):
    """Round-5 review finding: q1 = 2*h2*l2 reaches ~9.2e18 per element at
    |cents| near 2^31 with a large l2, so an un-split Arrow group sum wraps
    on TWO rows while certify_total_range(n=2) passes. Values are chosen to
    maximize q1 (c = 2^31 - 92681 makes l2 huge); exactness is asserted
    bit-for-bit against the DuckDB HUGEINT twin."""
    c = (2**31 - 92681) / 100.0  # dollars -> the adversarial cents value
    # 4 rows in one group: q1-sum wraps int64 pre-fix; n*max^4 < 2^127 so
    # the certificate (correctly) stays quiet — only the re-split saves it
    vals = [c, c, -c, c, 1.0, 2.0]
    types = ["hot"] * 4 + ["cold"] * 2
    _write_events(tmp_path, vals, types)
    got = (
        A.moments_by_type(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = _oracle(tmp_path)
    for col in got.columns:
        if got[col].dtype == object:
            assert (got[col] == want[col]).all(), col
        else:
            assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col


class TestKernelGuardBypasses:
    """Round-5 review findings: fail-open paths around INT64_MIN."""

    def test_int64_min_rejected_loudly(self):
        from sprout_ray.kernel.moments import MomentsSketch

        with pytest.raises(ValueError, match="rescale"):
            MomentsSketch().update_batch(
                np.array([-(2**63), 5], dtype=np.int64)
            )

    def test_huge_finite_float_rejected_before_cast(self):
        from sprout_ray.kernel.moments import MomentsSketch

        with pytest.raises(ValueError, match="rescale"):
            MomentsSketch().update_batch(np.array([1.0e30, 5.0]))

    def test_uint64_wrap_rejected_before_cast(self):
        from sprout_ray.kernel.moments import MomentsSketch

        with pytest.raises(ValueError, match="rescale"):
            MomentsSketch().update_batch(
                np.array([2**64 - 5], dtype=np.uint64)
            )
