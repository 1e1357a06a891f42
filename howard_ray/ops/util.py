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


# ---------------------------------------------------------------------------
# Scale-derived bucket counts for grouped folds (round-5 verdict item #1)
#
# Every bucketed map_groups fold in the operator library bounds its
# per-task input to O(total/n_buckets). A CONSTANT n_buckets (the old
# 64/128) is a memory wall at 100 TB (~1.5 TB per task at 64 buckets);
# these helpers derive the count from the INPUT SIZE instead — the same
# sampled-stats discipline the encode pipeline uses for salt sizing
# (pipeline.py `_per_source_counts_sampled`). Fold results are
# bucket-count-invariant by construction, so the derivation only has to
# be reasonable, not exact.
# ---------------------------------------------------------------------------

_BUCKET_CAP = 1 << 20  # runaway guard: ≥100 MB/task at 100 TB


def derive_buckets(total_bytes: float | int,
                   target_task_bytes: int | None = None) -> int:
    """Bucket count for a grouped fold whose shuffled payload is
    ``total_bytes``: enough buckets that one bucket's input fits a worker
    task (`HOWARD_TASK_BYTES`, default 64 MB), with a parallelism floor
    of 4x cluster CPUs (so small inputs still fan out) — rounded up to a
    power of two so near-identical inputs derive identical counts."""
    target = target_task_bytes or int(os.environ.get(
        "HOWARD_TASK_BYTES", 64 << 20))
    need = -(-max(1, int(total_bytes)) // target)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    n = max(need, min(4 * cpus, 256), 16)
    return min(1 << (int(n) - 1).bit_length(), _BUCKET_CAP)


def parquet_bytes(path: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte size of ``columns`` (all columns when None) from
    the parquet FOOTER only — no data read, deterministic in the file."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            if columns is None or name in columns:
                total += col.total_uncompressed_size
    return total


def parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    return pq.ParquetFile(path).metadata.num_rows


def buckets_for_table(sf_dir: str, name: str,
                      columns: list[str] | None = None,
                      factor: float = 1.0,
                      target_task_bytes: int | None = None) -> int:
    """derive_buckets over one test table's pruned footer size.
    ``factor`` scales for payload expansion (e.g. shingle hashes ≈ 1.3x
    the text bytes) or reduction (hash-only shuffles)."""
    b = parquet_bytes(os.path.join(sf_dir, f"{name}.parquet"), columns)
    return derive_buckets(b * factor, target_task_bytes)


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
