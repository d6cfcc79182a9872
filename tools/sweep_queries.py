"""Fragility sweep: run EVERY __ray_entry__.queries() entry at a given
sf dir, crash-isolated, and report errors + timings as one JSON line.

The round-4 lesson (VERDICT #3): a data-dependent guard that passes the
sf0.01 correctness gate can still fire on sf0.1's wider value tails
(`moments_by_type`'s |cents| <= 55108 died on $560.21 and zeroed the
driver bench).  This sweep is the pre-flight that catches any such
guard at the driver bench's own scale before the driver does.

Usage: python tools/sweep_queries.py [sf_dir] [name_prefix...]
Writes artifacts/sweep_<sfname>.json and exits non-zero on any error.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sprout_ray.tuning import apply_malloc_tuning  # noqa: E402

apply_malloc_tuning()


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    prefixes = tuple(sys.argv[2:])
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if prefixes:
        qs = {k: v for k, v in qs.items() if k.startswith(prefixes)}
    timings, errors = {}, {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if isinstance(res, ray.data.Dataset):
                res.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — the sweep must finish
            msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:300]
            errors[name] = msg
            print(f"ERROR {name}: {msg}", file=sys.stderr)
    ray.shutdown()
    report = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_errors": len(errors),
        "errors": errors,
        "total_sec": round(sum(timings.values()), 1),
        "timings": timings,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        f"sweep_{os.path.basename(sf_dir.rstrip('/'))}.json",
    )
    if not prefixes:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in report if k != "timings"}))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
