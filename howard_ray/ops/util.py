"""Shared helpers for the operator library.

Conventions (driver correctness-gate contract, /root/repo/__ray_entry__.py):
- every operator takes ``sf_dir`` and returns a small pyarrow Table /
  pandas DataFrame / ray Dataset;
- float aggregate columns are rounded (money 2dp, ratios/stats 4-5dp) in
  BOTH the Ray implementation and the oracle SQL so order-insensitive
  value-hashes agree despite summation-order float noise;
- column names match the oracle SQL exactly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def tbl(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of one test table."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


def to_table(x) -> pa.Table:
    if isinstance(x, ray.data.Dataset):
        refs = x.to_arrow_refs()
        import ray as _ray
        tables = [t for t in _ray.get(refs) if t.num_rows]
        return pa.concat_tables(tables) if tables else pa.table({})
    return x


def round_col(df, col, nd):
    df[col] = df[col].round(nd)
    return df
