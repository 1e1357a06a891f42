"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side over an sf dir, compare row-count, schema
(column names) and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = canon(to_df(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(res)} rows  ({dt:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-sql ] {name}: {e}")
            continue
        if list(res.columns) != list(exp.columns):
            failures.append(name)
            print(f"[FAIL-schema] {name}: ray={list(res.columns)} sql={list(exp.columns)}")
            continue
        if len(res) != len(exp):
            failures.append(name)
            print(f"[FAIL-rows] {name}: ray={len(res)} sql={len(exp)}")
            continue
        if not res.equals(exp):
            neq = (res != exp).any()
            failures.append(name)
            print(f"[FAIL-vals] {name}: differing cols: {list(neq[neq].index)}")
            print("  ray:", res.head(3).to_dict("records"))
            print("  sql:", exp.head(3).to_dict("records"))
            continue
        print(f"[OK       ] {name}: {len(res)} rows  ({dt:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
