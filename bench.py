"""Benchmark harness (driver contract).

Plain run: one JSON line with headline seconds + per-query seconds over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``.

``--scaling``: runs the headline job twice in fresh processes at num_cpus=8
and num_cpus=32 on the same input and reports both throughputs plus scaling
efficiency ``(t_8 / t_32) / 4`` (the in-sandbox evidence for the north
rule's N-vs-4N cluster criterion).

Headline job: the reference-demo equivalent at corpus scale
(/root/reference/cmd/main.go:24-47 — timed filter build + probes) = read the
1M-row synthetic source-code corpus -> sha256 invariant -> build the full
sketch battery in one streaming pass.
"""

import json
import os
import subprocess
import sys
import time

BENCH_CORPUS = "/tmp/sprout_bench_corpus_1m"
BENCH_ROWS = 1_000_000


def _ensure_bench_corpus():
    from sprout_ray.sources.synth import ensure_corpus

    return ensure_corpus(BENCH_CORPUS, BENCH_ROWS, n_files=32, seed=42)


def headline(sf_dir: str) -> dict:
    """Corpus sketch battery: the timed rows/s number."""
    from sprout_ray.kernel import SketchSpec
    from sprout_ray.pipelines.flagship import multi_sketch_build, with_invariant
    from sprout_ray.sources.synth import read_corpus

    corpus = _ensure_bench_corpus()
    # warm OS page cache so we measure compute+shuffle, not first-touch IO
    read_corpus(corpus, columns=["repo"]).count()

    t0 = time.time()
    ds = read_corpus(corpus, columns=["repo", "path", "lang", "content"])
    ds = with_invariant(ds)
    built = multi_sketch_build(
        ds,
        {
            "bloom_sha": (SketchSpec.of("bloom", 0.001, int(BENCH_ROWS * 1.2)), "sha256"),
            "hll_repo": (SketchSpec.of("hll", 14), "repo"),
            "hll_sha": (SketchSpec.of("hll", 14), "sha256"),
            "cms_path": (SketchSpec.of("cms", 0.0001, 0.01), "path"),
        },
    )
    elapsed = time.time() - t0
    assert built["_rows"] == BENCH_ROWS
    assert built["bloom_sha"].count == BENCH_ROWS
    return {"sec": elapsed, "rows": BENCH_ROWS, "rows_per_sec": BENCH_ROWS / elapsed}


def _timed(fn, *args):
    t0 = time.time()
    fn(*args)
    return time.time() - t0


def query_suite(sf_dir: str) -> dict:
    """Representative per-query timings over the driver sf dir."""
    import sprout_ray.pipelines.analytics as A
    from sprout_ray.pipelines.flagship import flagship_over_documents

    def consume(res):
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res.count()

    out = {}
    for name, fn in [
        ("flagship_documents", flagship_over_documents),
        ("q1_pricing_summary", A.q1_pricing_summary),
        ("exact_dedup_first", A.exact_dedup_first),
        ("hll_by_lang", A.hll_by_lang),
        ("quantile_sketches", A.quantile_sketches),
        ("bloom_probe_prune", A.bloom_probe_prune),
        ("minhash_neardup", A.minhash_neardup),
        ("token_counts", A.token_counts),
    ]:
        t0 = time.time()
        consume(fn(sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def run_once() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    head = headline(sf_dir)
    queries = {} if os.environ.get("SPROUT_BENCH_HEADLINE_ONLY") else query_suite(sf_dir)
    ray.shutdown()
    return {
        "metric": "corpus sketch-battery build (1M rows: sha256 + bloom/hll/hll/cms)",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "rows": head["rows"],
        "rows_per_sec": round(head["rows_per_sec"]),
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


def run_scaling() -> dict:
    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            SPROUT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = sub(lo), sub(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (same 1M-row build at num_cpus=8 vs 32)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "rows_per_sec_8": r_lo["rows_per_sec"],
        "rows_per_sec_32": r_hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "rows": r_lo["rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
