"""Ray-layer tests: aggregation adapters, probes, checkpoints, pipelines.

Uses the session-scoped ray fixture (tests/conftest.py) and a small
deterministic corpus generated in /tmp.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from sprout_ray.kernel import SketchSpec
from sprout_ray.kernel.sketch import sketch_from_bytes

CORPUS_DIR = "/tmp/sprout_test_corpus"
N_ROWS = 8_000


@pytest.fixture(scope="session")
def corpus(ray_session):
    from sprout_ray.sources.synth import ensure_corpus

    return ensure_corpus(CORPUS_DIR, N_ROWS, n_files=4, seed=42)


@pytest.fixture(scope="session")
def corpus_ds(corpus):
    from sprout_ray.sources.synth import read_corpus

    return read_corpus(corpus)


def test_corpus_determinism(corpus):
    from sprout_ray.sources.synth import generate_repo_table

    a = generate_repo_table(500, seed=42, offset=100, total_rows=1000)
    b = generate_repo_table(500, seed=42, offset=100, total_rows=1000)
    assert a.equals(b)


def test_build_modes_agree(corpus_ds):
    """partials-mode and agg-mode produce bitwise-identical filters
    (order-insensitivity of the merge)."""
    from sprout_ray.pipelines.flagship import with_invariant
    from sprout_ray.stages.builder import build_sketch

    ds = with_invariant(corpus_ds)
    spec = SketchSpec.of("bloom", 0.001, N_ROWS * 2)
    a = build_sketch(ds, spec, on="sha256", mode="partials")
    b = build_sketch(ds, spec, on="sha256", mode="agg")
    assert a.count == b.count == N_ROWS
    assert (a.bits == b.bits).all()


def test_two_parallelism_levels_equal_sketch(corpus):
    """Same input at different block layouts -> identical final sketch
    (the in-sandbox stand-in for cluster-size invariance)."""
    from sprout_ray.sources.synth import read_corpus
    from sprout_ray.pipelines.flagship import with_invariant
    from sprout_ray.stages.builder import build_sketch

    spec = SketchSpec.of("hll", 12)
    outs = []
    for parallelism in (2, 8):
        ds = read_corpus(corpus).repartition(parallelism)
        ds = with_invariant(ds)
        outs.append(build_sketch(ds, spec, on="sha256", mode="partials"))
    assert (outs[0].registers == outs[1].registers).all()


def test_no_false_negatives_distributed(corpus_ds):
    from sprout_ray.pipelines.flagship import with_invariant
    from sprout_ray.stages.builder import build_sketch
    from sprout_ray.stages.probe import probe_filter

    ds = with_invariant(corpus_ds)
    bf = build_sketch(ds, SketchSpec.of("bloom", 0.001, N_ROWS * 2), on="sha256")
    kept = probe_filter(ds, bf, on="sha256", mode="maybe", concurrency=2).count()
    assert kept == N_ROWS  # every member retained: no false negatives


def test_probe_fpr_within_epsilon(corpus_ds):
    import ray.data as rd

    from sprout_ray.pipelines.flagship import with_invariant
    from sprout_ray.stages.builder import build_sketch
    from sprout_ray.stages.probe import probe_filter

    eps = 0.001
    ds = with_invariant(corpus_ds)
    bf = build_sketch(ds, SketchSpec.of("bloom", eps, N_ROWS * 2), on="sha256")
    n_probe = 50_000
    foreign = rd.from_arrow(
        pa.table({"sha256": [f"foreign-{i}" for i in range(n_probe)]})
    )
    fp = probe_filter(foreign, bf, on="sha256", mode="maybe", concurrency=2).count()
    assert fp / n_probe <= eps + 3 * (eps / n_probe) ** 0.5


def test_sha256_invariant_preserved(corpus_ds):
    """The multiset of sha256(content) out of a transform equals the multiset
    in (BASELINE.json:input_hint per-row invariant)."""
    import hashlib

    from sprout_ray.pipelines.flagship import with_invariant

    ds = with_invariant(corpus_ds)
    shas_in = sorted(
        hashlib.sha256(r["content"].encode()).hexdigest()
        for r in corpus_ds.select_columns(["content"]).take_all()
    )
    # a shuffle-heavy transform: repartition + filter-noop
    out = ds.repartition(7).map_batches(lambda t: t, batch_format="pyarrow")
    shas_out = sorted(r["sha256"] for r in out.select_columns(["sha256"]).take_all())
    assert shas_in == shas_out


def test_grouped_hll_matches_exact(corpus_ds):
    import duckdb

    from sprout_ray.stages.builder import build_grouped

    out = build_grouped(
        corpus_ds,
        SketchSpec.of("hll", 12),
        on="repo",
        key="lang",
        finalizer=lambda s: float(s.estimate()),
        alias="est",
    ).to_pandas()
    exact = duckdb.sql(
        f"SELECT lang, count(DISTINCT repo) c FROM read_parquet('{CORPUS_DIR}/part-*.parquet') GROUP BY lang"
    ).df()
    m = out.merge(exact, on="lang")
    rel = (m["est"] - m["c"]).abs() / m["c"]
    assert (rel <= 3 * 1.04 / np.sqrt(2**12) + 0.01).all()


def test_multi_sketch_single_pass(corpus_ds):
    from sprout_ray.pipelines.flagship import multi_sketch_build, with_invariant

    ds = with_invariant(corpus_ds)
    built = multi_sketch_build(
        ds,
        {
            "bloom": (SketchSpec.of("bloom", 0.01, N_ROWS * 2), "sha256"),
            "hll": (SketchSpec.of("hll", 12), "repo"),
            "cms": (SketchSpec.of("cms", 0.001, 0.01), "lang"),
        },
    )
    assert built["_rows"] == N_ROWS
    assert built["bloom"].count == N_ROWS
    assert built["hll"].estimate() > 10
    assert built["cms"].total == N_ROWS


def test_checkpoint_resume(corpus, tmp_path):
    from sprout_ray.state.checkpoint import build_with_checkpoints, completed_partitions

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )
    spec = SketchSpec.of("hll", 12)
    ck = str(tmp_path / "ckpt")
    full, m1 = build_with_checkpoints(files, spec, on="repo", ckpt_dir=ck)
    assert m1["built"] == len(files) and m1["resumed"] == 0
    assert m1["rows"] == N_ROWS
    # rerun: everything resumes from checkpoints, nothing rebuilt
    again, m2 = build_with_checkpoints(files, spec, on="repo", ckpt_dir=ck)
    assert m2["built"] == 0 and m2["resumed"] == len(files)
    assert (full.registers == again.registers).all()
    # partial resume: drop one checkpoint, only that partition rebuilds
    done = completed_partitions(ck, spec)
    victim = sorted(done)[0]
    os.remove(os.path.join(ck, f"part-{victim:05d}.parquet"))
    third, m3 = build_with_checkpoints(files, spec, on="repo", ckpt_dir=ck)
    assert m3["built"] == 1 and m3["resumed"] == len(files) - 1
    assert (full.registers == third.registers).all()


def test_checkpoint_lineage_mismatch_rebuilds(corpus, tmp_path):
    # same partition ids, but partitioning changed (2 files/partition vs 1):
    # recorded lineage no longer matches -> stale checkpoints must NOT merge
    from sprout_ray.state.checkpoint import build_with_checkpoints

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )
    assert len(files) >= 2
    spec = SketchSpec.of("hll", 12)
    ck = str(tmp_path / "ckpt_lin")
    build_with_checkpoints(files[:2], spec, on="repo", ckpt_dir=ck)
    full, m = build_with_checkpoints(
        files, spec, on="repo", ckpt_dir=ck, files_per_partition=2
    )
    assert m["invalidated"] >= 1 and m["resumed"] == 0
    # result equals a clean build over all files
    clean, _ = build_with_checkpoints(
        files, spec, on="repo", ckpt_dir=str(tmp_path / "ckpt_clean"),
        files_per_partition=2,
    )
    assert (full.registers == clean.registers).all()


def test_checkpoint_spec_mismatch_not_resumed(corpus, tmp_path):
    from sprout_ray.state.checkpoint import build_with_checkpoints

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )[:2]
    ck = str(tmp_path / "ckpt2")
    build_with_checkpoints(files, SketchSpec.of("hll", 12), on="repo", ckpt_dir=ck)
    # different geometry -> stale checkpoints ignored, fresh build
    _, m = build_with_checkpoints(files, SketchSpec.of("hll", 10), on="repo", ckpt_dir=ck)
    assert m["resumed"] == 0


def test_sbf_distributed_growth(corpus_ds):
    from sprout_ray.pipelines.flagship import with_invariant
    from sprout_ray.stages.builder import build_sketch

    ds = with_invariant(corpus_ds)
    sbf = build_sketch(ds, SketchSpec.of("sbf", 0.001, N_ROWS // 16), on="sha256")
    assert sbf.count() == N_ROWS
    assert len(sbf.filters) > 1  # growth actually happened across partials
    assert sbf.prob() <= 0.001 / (1 - 0.9)


def test_serialized_roundtrip_through_object_store(corpus_ds):
    import ray

    from sprout_ray.stages.builder import build_sketch

    h = build_sketch(corpus_ds, SketchSpec.of("hll", 12), on="repo")
    ref = ray.put(h.to_bytes())
    back = sketch_from_bytes(ray.get(ref))
    assert (back.registers == h.registers).all()


def test_multi_checkpoint_resume(corpus, tmp_path):
    """One-scan multi-sketch build resumes as a unit; results match the
    single-sketch checkpointed builds."""
    from sprout_ray.state.checkpoint import (
        build_multi_with_checkpoints,
        build_with_checkpoints,
    )

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )
    specs = {
        "hll_repo": (SketchSpec.of("hll", 12), "repo"),
        "cms_lang": (SketchSpec.of("cms", 0.001, 0.01), "lang"),
        "mg_lang": (SketchSpec.of("mg", 64), "lang"),
    }
    ck = str(tmp_path / "mck")
    built, m1 = build_multi_with_checkpoints(files, specs, ckpt_dir=ck)
    assert m1["built"] == len(files) and m1["resumed"] == 0
    assert m1["rows"] == N_ROWS
    single, _ = build_with_checkpoints(
        files, specs["hll_repo"][0], on="repo", ckpt_dir=str(tmp_path / "sck")
    )
    assert (built["hll_repo"].registers == single.registers).all()
    assert built["mg_lang"].total == N_ROWS and built["mg_lang"].err_bound == 0

    # full resume: nothing rebuilt, identical states
    again, m2 = build_multi_with_checkpoints(files, specs, ckpt_dir=ck)
    assert m2["built"] == 0 and m2["resumed"] == len(files)
    assert (again["hll_repo"].registers == built["hll_repo"].registers).all()
    assert again["mg_lang"].counts == built["mg_lang"].counts

    # partial resume: drop one partition's manifest -> only it rebuilds
    os.remove(os.path.join(ck, "multi-00000.parquet"))
    third, m3 = build_multi_with_checkpoints(files, specs, ckpt_dir=ck)
    assert m3["built"] == 1 and m3["resumed"] == len(files) - 1
    assert (third["hll_repo"].registers == built["hll_repo"].registers).all()

    # spec change for ONE sketch invalidates the unit (shared scan)
    specs2 = dict(specs)
    specs2["hll_repo"] = (SketchSpec.of("hll", 10), "repo")
    _, m4 = build_multi_with_checkpoints(files, specs2, ckpt_dir=ck)
    assert m4["built"] == len(files) and m4["resumed"] == 0


def test_multi_checkpoint_derive_column(corpus, tmp_path):
    """Sketches over derived columns (sha256 invariant) checkpoint too."""
    from sprout_ray.functions.hashing import add_sha256
    from sprout_ray.state.checkpoint import build_multi_with_checkpoints

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )[:2]
    specs = {
        "bloom_sha": (SketchSpec.of("bloom", 0.01, 20_000), "sha256"),
        "hll_sha": (SketchSpec.of("hll", 12), "sha256"),
    }
    built, m = build_multi_with_checkpoints(
        files, specs, ckpt_dir=str(tmp_path / "dck"),
        derive=lambda t: add_sha256(t, column="content"),
    )
    assert m["built"] == 2
    assert built["bloom_sha"].count == m["rows"]
    resumed, m2 = build_multi_with_checkpoints(
        files, specs, ckpt_dir=str(tmp_path / "dck"),
        derive=lambda t: add_sha256(t, column="content"),
    )
    assert m2["resumed"] == 2 and m2["built"] == 0
    assert resumed["bloom_sha"].count == built["bloom_sha"].count


def test_checkpoint_resume_new_sketch_kinds(corpus, tmp_path):
    """The round-4 sketches (cbf / moments / fd) ride the same per-partition
    checkpoint + lineage machinery as the originals: registration in
    kernel/sketch.py is the only integration point."""
    from sprout_ray.state.checkpoint import build_with_checkpoints

    files = sorted(
        os.path.join(corpus, p) for p in os.listdir(corpus) if p.endswith(".parquet")
    )
    spec = SketchSpec.of("cbf", 0.01, N_ROWS + 11)
    ck = str(tmp_path / "ckpt_cbf")
    full, m1 = build_with_checkpoints(files, spec, on="repo", ckpt_dir=ck)
    assert m1["built"] == len(files) and m1["resumed"] == 0
    again, m2 = build_with_checkpoints(files, spec, on="repo", ckpt_dir=ck)
    assert m2["built"] == 0 and m2["resumed"] == len(files)
    assert full.count == N_ROWS and again.count == N_ROWS
    assert (full.counts == again.counts).all()
    full.validate()
