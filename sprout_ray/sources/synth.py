"""Deterministic synthetic source-code repo corpus (FIXTURES.md F1).

The north-rule input table (BASELINE.json:input_hint):
``(repo:string, path:string, commit:string, lang:string, content:string)``,
notionally at 10^12-file scale; synthesized here at small scale with:

- zipf-distributed repo sizes (repo-level skew — a few giant repos),
- ~20 zipf-skewed languages,
- a controlled ~5% duplicate-content rate (so exact vs approximate distinct
  counts diverge measurably),
- log-normal-ish content lengths,
- everything a pure function of (seed, row index) — no wall clock.

Written as multi-file Parquet so ``read_parquet`` parallelizes; a manifest
file makes regeneration idempotent.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = [
    "python", "javascript", "java", "c", "cpp", "go", "ruby", "php",
    "typescript", "csharp", "shell", "rust", "kotlin", "swift", "scala",
    "perl", "lua", "haskell", "r", "julia",
]
_EXT = {
    "python": "py", "javascript": "js", "java": "java", "c": "c", "cpp": "cc",
    "go": "go", "ruby": "rb", "php": "php", "typescript": "ts", "csharp": "cs",
    "shell": "sh", "rust": "rs", "kotlin": "kt", "swift": "swift",
    "scala": "scala", "perl": "pl", "lua": "lua", "haskell": "hs", "r": "r",
    "julia": "jl",
}

DUP_RATE = 0.05


def _zipf_probs(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def generate_repo_table(
    n_rows: int, seed: int = 42, offset: int = 0, total_rows: int | None = None
) -> pa.Table:
    """Generate ``n_rows`` rows of the repo corpus deterministically.

    ``offset`` shifts the global row-id space so multi-file generation can
    produce disjoint, deterministic shards of one logical table;
    ``total_rows`` sizes the global repo universe so every shard draws from
    the same zipf-skewed repo population.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, offset]))
    n_repos = max(4, (total_rows or n_rows) // 200)

    repo_idx = rng.choice(n_repos, size=n_rows, p=_zipf_probs(n_repos, 1.1))
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=_zipf_probs(len(LANGS), 1.0))

    # ~DUP_RATE of rows reuse another row's content id
    content_id = np.arange(offset, offset + n_rows, dtype=np.int64)
    dup_mask = rng.random(n_rows) < DUP_RATE
    if dup_mask.any() and n_rows > 1:
        content_id[dup_mask] = content_id[rng.integers(0, n_rows, dup_mask.sum())]

    pkg = rng.integers(0, 40, n_rows)
    mod = rng.integers(0, 500, n_rows)
    # log-normal-ish padding length in "lines"
    pad = np.maximum(1, rng.lognormal(2.0, 0.8, n_rows)).astype(np.int64)
    c1 = rng.integers(0, 1 << 62, n_rows, dtype=np.int64)
    c2 = rng.integers(0, 1 << 62, n_rows, dtype=np.int64)
    c3 = rng.integers(0, 1 << 62, n_rows, dtype=np.int64)

    langs = [LANGS[i] for i in lang_idx]
    repos = [f"org-{i % 97:03d}/repo-{i:05d}" for i in repo_idx]
    paths = [
        f"src/pkg_{p}/mod_{m}.{_EXT[lg]}" for p, m, lg in zip(pkg, mod, langs)
    ]
    commits = [f"{a:016x}{b:016x}{c:016x}"[:40] for a, b, c in zip(c1, c2, c3)]
    contents = [
        (
            f"def f_{cid}():\n"
            f"    # module {cid % 1009}\n"
            f"    return {(cid * 2654435761) % 1000003}\n"
            + "# pad line for length realism\n" * int(k)
        )
        for cid, k in zip(content_id, pad)
    ]

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.large_string()),
        }
    )


def ensure_corpus(
    out_dir: str, n_rows: int, n_files: int = 16, seed: int = 42
) -> str:
    """Idempotently write the corpus as ``n_files`` Parquet shards.

    Layout is one file per shard (resumable: a rerun skips shards that are
    already present and only rewrites missing ones; the manifest records the
    generation parameters)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    want = {
        "n_rows": n_rows,
        "n_files": n_files,
        "seed": seed,
        "dup_rate": DUP_RATE,
        "gen": 2,  # bump to invalidate corpora from older generator versions
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return out_dir
        # stale manifest: drop old shards so they are regenerated
        for p in os.listdir(out_dir):
            if p.endswith(".parquet"):
                os.remove(os.path.join(out_dir, p))
        os.remove(manifest_path)
    per = n_rows // n_files
    todo = []
    for i in range(n_files):
        shard = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if os.path.exists(shard):
            continue
        rows = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        todo.append((shard, rows, i * per))

    def _write(shard: str, rows: int, offset: int) -> None:
        tbl = generate_repo_table(rows, seed=seed, offset=offset, total_rows=n_rows)
        pq.write_table(tbl, shard + ".tmp")
        os.replace(shard + ".tmp", shard)

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        gen = ray.remote(num_cpus=1)(_write)
        ray.get([gen.remote(*args) for args in todo])
    else:
        for args in todo:
            _write(*args)
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return out_dir


def read_corpus(dir_or_paths, columns=None, **kwargs):
    """Column-pruned Ray Dataset over the corpus parquet files."""
    import ray.data as rd

    if isinstance(dir_or_paths, str) and os.path.isdir(dir_or_paths):
        paths = sorted(
            os.path.join(dir_or_paths, p)
            for p in os.listdir(dir_or_paths)
            if p.endswith(".parquet")
        )
    else:
        paths = dir_or_paths
    return rd.read_parquet(paths, columns=columns, **kwargs)
