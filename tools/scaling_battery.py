"""Interleaved scaling-efficiency battery (north-rule N-vs-4N evidence).

Runs the 16M-row headline build in FRESH processes at num_cpus in
{2, 8, 4, 16}, round-robin for ``rounds`` rounds (interleaving makes every
level sample the same shared-host noise distribution), one timed trial per
process (plus the untimed warm-up each process always does). Reports
per-level trial lists, per-level minima (standard noise-floor estimator),
and the two N-vs-4N efficiencies:

    eff(a, b) = (t_a_min / t_b_min) / (b / a)

Usage:  python tools/scaling_battery.py [rounds]   (default 4)
Writes /tmp/scaling_battery.json and prints it.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = [2, 8, 4, 16]
PAIRS = [(2, 8), (4, 16)]
# efficiency is a ratio: 8M rows keeps per-invocation wall sane at 2 CPUs
# (a 16M 2-CPU build costs ~20 min/trial in slow host phases) while fixed
# overheads stay <5% of the 16-CPU time; warm-up only needs to spawn the
# worker pool, so it runs on a 1M corpus.
ROWS = int(os.environ.get("SPROUT_BENCH_ROWS", "8000000"))
WARMUP_ROWS = int(os.environ.get("SPROUT_BENCH_WARMUP_ROWS", "1000000"))


def one(ncpu: int) -> float:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        SPROUT_BENCH_HEADLINE_ONLY="1",
        SPROUT_BENCH_TRIALS="1",
        SPROUT_BENCH_ROWS=str(ROWS),
        SPROUT_BENCH_WARMUP_ROWS=str(WARMUP_ROWS),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])["value"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
        "metric": f"interleaved scaling battery ({ROWS}-row headline build, "
        f"1 timed trial/process, {rounds} rounds)",
        "trials": {str(n): trials[n] for n in LEVELS},
        "min": {str(n): min(trials[n]) for n in LEVELS},
    }
    for a, b in PAIRS:
        eff = (min(trials[a]) / min(trials[b])) / (b / a)
        result[f"efficiency_{a}_to_{b}"] = round(eff, 3)
    with open("/tmp/scaling_battery.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
