"""bench.py harness contract: one raising query can never zero the
artifact again (BENCH_r04 regression — rc=1, parsed null).

These tests run the REAL query_suite loop with injected callables (no
Ray needed: consume() only touches Datasets) and the real _emit, and
assert the compact last line stays parseable with error strings inline.
"""

import json

import bench


def test_query_suite_isolates_a_raising_query():
    calls = []

    def ok(sf):
        calls.append(sf)
        return None

    def boom(sf):
        raise ValueError("planted failure: |cents| > whatever")

    out = bench.query_suite(
        "/tmp/nowhere",
        queries=[("a_ok", ok), ("boom", boom), ("b_ok", ok)],
    )
    assert list(out) == ["a_ok", "boom", "b_ok"]  # loop continued past boom
    assert isinstance(out["a_ok"], float) and isinstance(out["b_ok"], float)
    assert out["boom"].startswith("ERROR: ValueError: planted failure")
    assert len(calls) == 2


def test_emit_compact_line_survives_query_errors(capsys, monkeypatch):
    monkeypatch.setenv("SPROUT_BENCH_NO_ARTIFACT", "1")
    bench._emit(
        {
            "metric": "m",
            "value": 1.5,
            "unit": "sec",
            "queries": {"q1": 2.0, "q2": "ERROR: ValueError: x", "q3": 3.0},
            "sf": "sf0.1",
            "num_cpus": 32,
        }
    )
    lines = capsys.readouterr().out.strip().splitlines()
    compact = json.loads(lines[-1])  # the driver's tail window
    assert compact["value"] == 1.5
    assert compact["n_queries"] == 3
    assert compact["queries_total_sec"] == 5.0  # numeric-only sum
    assert compact["n_query_errors"] == 1 and compact["query_errors"] == ["q2"]
    assert len(lines[-1]) < 500


def test_emit_compact_line_survives_headline_failure(capsys, monkeypatch):
    monkeypatch.setenv("SPROUT_BENCH_NO_ARTIFACT", "1")
    bench._emit(
        {
            "metric": "m",
            "value": None,
            "unit": "sec",
            "headline_error": "ERROR: RuntimeError: headline died",
            "queries": {"q1": 2.0},
            "sf": "sf0.1",
            "num_cpus": 32,
        }
    )
    compact = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert compact["value"] is None
    assert compact["headline_error"].startswith("ERROR:")
    assert compact["queries_total_sec"] == 2.0


def test_headline_only_children_do_not_write_artifacts(
    capsys, monkeypatch, tmp_path
):
    """--scaling child runs (SPROUT_BENCH_HEADLINE_ONLY) must never clobber
    bench_last_full.json — a round-5 regression found when a scaling run's
    8-CPU child overwrote the 104-query artifact with a queries={} record."""
    import os

    monkeypatch.delenv("SPROUT_BENCH_NO_ARTIFACT", raising=False)
    monkeypatch.setenv("SPROUT_BENCH_HEADLINE_ONLY", "1")
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)),
        "artifacts",
        "bench_last_full.json",
    )
    before = open(artifact).read() if os.path.exists(artifact) else None
    bench._emit({"metric": "m", "value": 9.9, "unit": "sec", "queries": {}})
    after = open(artifact).read() if os.path.exists(artifact) else None
    assert before == after  # untouched
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["value"] == 9.9
