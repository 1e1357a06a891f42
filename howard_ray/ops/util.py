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


def bucketed_lookup(ds: ray.data.Dataset, key: str,
                    lookup: ray.data.Dataset, lookup_key: str,
                    value_cols: list[str], n_buckets: int = 64,
                    how: str = "inner",
                    ds_schema: pa.Schema | None = None,
                    lookup_schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Join-free keyed lookup: attach ``value_cols`` from ``lookup`` to
    ``ds`` rows matching ``ds[key] == lookup[lookup_key]``, expressed as a
    bucketed co-shuffle (union under a shared ``key % n_buckets`` bucket +
    one vectorized pandas merge per bucket).

    Exists because ``ray.data.Dataset.join`` (2.49) emits ZERO-COLUMN
    blocks for empty output partitions and map functions never run on
    empty blocks — so a join output fed into another join dies inside
    Arrow. groupby/map_groups tolerate schemaless empties, making this the
    composable form (DESIGN.md §13). Key columns must be int64; lookup
    must be unique on ``lookup_key`` for ``how='inner'`` row counts to
    match a SQL join. Bucket count bounds per-task memory to
    O((|ds|+|lookup|)/n_buckets) — size it to the cluster like every
    other grouped shuffle."""
    import numpy as np
    import pandas as pd

    # pass schemas explicitly when the input is mid-pipeline (Dataset
    # .schema() executes a subplan to infer it, doubling upstream work)
    if ds_schema is None:
        ds_schema = ds.schema().base_schema
    if lookup_schema is None:
        lookup_schema = lookup.schema().base_schema
    keep = list(ds_schema.names)
    ds_types = {c: ds_schema.field(c).type for c in keep}
    lk_types = {c: lookup_schema.field(c).type for c in value_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy()
        cols = {"__b": pa.array(k % n_buckets),
                "__side": pa.array(np.zeros(len(k), dtype=np.int8))}
        for c in keep:
            cols[c] = batch[c]
        for c in value_cols:
            cols[f"__v_{c}"] = pa.nulls(len(k), lk_types[c])
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        k = batch[lookup_key].to_numpy()
        cols = {"__b": pa.array(k % n_buckets),
                "__side": pa.array(np.ones(len(k), dtype=np.int8))}
        for c in keep:
            if c == key:
                cols[c] = pa.array(k)
            else:
                cols[c] = pa.nulls(len(k), ds_types[c])
        for c in value_cols:
            cols[f"__v_{c}"] = batch[c]
        return pa.table(cols)

    out_schema = pa.schema([(c, ds_types[c]) for c in keep]
                           + [(c, lk_types[c]) for c in value_cols])

    def merge(g: pd.DataFrame):
        left = g[g["__side"] == 0]
        right = g[g["__side"] == 1]
        vmap = right[[key] + [f"__v_{c}" for c in value_cols]]
        m = left[keep].merge(vmap, on=key, how=how)
        out = m.rename(columns={f"__v_{c}": c for c in value_cols})
        # emit Arrow with the EXPLICIT schema: per-group pandas→Arrow type
        # inference diverges on nested/empty groups (a list<int64> column
        # infers list<double> or null in a group with NaN/empty rows) and
        # the downstream concat then fails on the type mismatch
        return pa.Table.from_pandas(out[keep + value_cols],
                                    schema=out_schema, preserve_index=False)

    # union needs one schema; left rows carry null value slots, lookup
    # rows carry nulls for the non-key ds columns (string placeholder is
    # fine — merge only reads the key + value slots from each side)
    left_t = ds.map_batches(tag_left, batch_format="pyarrow")
    right_t = lookup.map_batches(tag_lookup, batch_format="pyarrow")
    return (left_t.union(right_t)
                  .groupby("__b")
                  .map_groups(merge, batch_format="pandas"))
