"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir; compare to oracle_sql() via DuckDB when present
(row-count + schema + order-insensitive value compare), else rows-only.

Usage: python tools/check_conformance.py [sf_dir] [query ...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        el = time.time() - t0
        if name in oracles:
            theirs = canon(con.execute(oracles[name]).df())
            if list(mine.columns) != list(theirs.columns):
                failures.append(name)
                print(f"FAIL {name}: columns {list(mine.columns)} vs {list(theirs.columns)}")
                continue
            if len(mine) != len(theirs):
                failures.append(name)
                print(f"FAIL {name}: rows {len(mine)} vs {len(theirs)}")
                continue
            eq = mine.equals(theirs)
            if not eq:
                diff = (mine != theirs).any(axis=1)
                failures.append(name)
                print(f"FAIL {name}: {int(diff.sum())} mismatched rows of {len(mine)}")
                print(pd.concat([mine[diff].head(3), theirs[diff].head(3)]))
                continue
            print(f"OK   {name}: {len(mine)} rows match oracle ({el:.1f}s)")
        else:
            print(f"ok?  {name}: rows-only, {len(mine)} rows ({el:.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all conformance checks passed")


if __name__ == "__main__":
    main()
