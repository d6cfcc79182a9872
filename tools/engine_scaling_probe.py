"""Engine-scaling probe on host-noise-immune work.

The sketch battery is memory-subsystem-bound, and this sandbox VM's memory
throughput swings ~4-10x with neighbor weather (see BASELINE.md), so its
N-vs-4N wall-clock cannot resolve the ENGINE's scaling. This probe removes
the confound: the same Ray Data pipeline shape (read -> map_batches over 64
blocks -> consume), but each block does FIXED in-L2-cache integer work that
round-1's pure-ALU measurements showed runs at ~97% efficiency up to 16-way
concurrency on this VM. Whatever efficiency this probe records is the
engine's (scheduling, dispatch, block handoff) — the machine can't hide it.

Usage: python tools/engine_scaling_probe.py [rounds]   (default 3)
Levels via SPROUT_PROBE_LEVELS (default "2,8,4,16"); every (a, 4a) pair
present yields an efficiency entry. Writes /tmp/engine_scaling_<levels>.json
and prints the JSON to stdout.
"""

import json
import os
import subprocess
import sys
import time

LEVELS = [
    int(x) for x in os.environ.get("SPROUT_PROBE_LEVELS", "2,8,4,16").split(",")
]
PAIRS = [(a, b) for a in LEVELS for b in LEVELS if b == 4 * a]
BLOCKS = 64
CHILD = """
import os, sys, time
sys.path.insert(0, "/root/repo")
from sprout_ray.tuning import apply_malloc_tuning
apply_malloc_tuning()
import numpy as np
import ray

ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd

def fixed_work(batch):
    # ~4 s of in-L2 integer ALU per block: LCG sweeps over a 1.6 MB array.
    # Sized so the 16-CPU run (~16 s ideal) amortizes the streaming
    # executor's ~1-2 s fixed dispatch cost.
    x = np.arange(200_000, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for _ in range(16000):
            x = x * np.uint64(2862933555777941757) + np.uint64(3037000493)
    batch["acc"] = [int(x[0])]
    return batch

ds = rd.range(64, override_num_blocks=64).map_batches(
    fixed_work, batch_format="pandas", batch_size=None)
ds.materialize()  # warm the pool
t0 = time.time()
rd.range(64, override_num_blocks=64).map_batches(
    fixed_work, batch_format="pandas", batch_size=None).materialize()
print(time.time() - t0)
ray.shutdown()
"""


def one(ncpu: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(ncpu)],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    ).stdout
    return float(out.strip().splitlines()[-1])


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    trials: dict = {n: [] for n in LEVELS}
    t0 = time.time()
    for r in range(rounds):
        for n in LEVELS:
            sec = one(n)
            trials[n].append(round(sec, 2))
            print(
                f"[round {r + 1}/{rounds}] num_cpus={n}: {sec:.1f}s "
                f"(elapsed {time.time() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
    result = {
        "metric": f"engine scaling on in-cache ALU blocks ({BLOCKS} blocks, "
        f"~4s each, {rounds} interleaved rounds, min per level)",
        "trials": {str(n): trials[n] for n in LEVELS},
        "min": {str(n): min(trials[n]) for n in LEVELS},
    }
    for a, b in PAIRS:
        eff = (min(trials[a]) / min(trials[b])) / (b / a)
        result[f"efficiency_{a}_to_{b}"] = round(eff, 3)
    out_path = "/tmp/engine_scaling_" + "_".join(str(n) for n in LEVELS) + ".json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
