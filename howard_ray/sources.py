"""Sources and sinks — the reference's format surface re-expressed on Ray.

Reference (howard/objects/database.py):
- delimiter table SEP_TYPE for csv/tsv/psv/tbl/bed (database.py:33-39)
- parquet reader incl. hive-partitioned dirs (database.py:1295-1317)
- JSON reader (database.py:1404-1407)
- universal exporter dispatching on extension (database.py:2124-2925)
- hive-partitioned parquet writer (database.py:2774-2780)
- header sidecar ``.hdr`` with schema metadata (variants.py:2351-2444)

Here each becomes a thin, typed wrapper over the native Ray Data
readers/writers (lazy, block-parallel, zero-copy Arrow), plus a JSON
"sidecar" manifest writer that plays the .hdr role: schema + row count +
provenance next to every output directory.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray.data

# reference SEP_TYPE, database.py:33-39
SEP_TYPE = {
    "csv": ",",
    "tsv": "\t",
    "psv": "|",
    "tbl": "|",
    "bed": "\t",
    "txt": "\t",
}


def infer_format(path: str) -> str:
    base = path[:-3] if path.endswith(".gz") else path
    return os.path.splitext(base)[1].lstrip(".").lower()


def read_any(path: str, columns: list[str] | None = None,
             schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Extension-dispatched reader (the reference's get_sql_from,
    database.py:1365-1469). Parquet paths may be files or hive-partitioned
    directories — ray.data.read_parquet handles both natively. ``.gz``
    text inputs decompress transparently (reference database.py:1320-1401);
    ``.vcf[.gz]`` goes through the VCF header/body reader."""
    if os.path.isdir(path):
        names = os.listdir(path)
        fmt = ("vcf" if any(n.endswith((".vcf", ".vcf.gz")) for n in names)
               else "parquet")
    else:
        fmt = infer_format(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if fmt == "vcf":
        from .vcf import read_vcf
        ds, _ = read_vcf(path, columns=columns)
        return ds
    if fmt in ("json", "ndjson", "jsonl"):
        ds = ray.data.read_json(path)
        return ds.select_columns(columns) if columns else ds
    if fmt in SEP_TYPE:
        from pyarrow import csv as pacsv
        parse = pacsv.ParseOptions(delimiter=SEP_TYPE[fmt])
        convert = None
        if schema is not None:
            convert = pacsv.ConvertOptions(
                column_types={f.name: f.type for f in schema})
        kwargs = {"parse_options": parse}
        if convert is not None:
            kwargs["convert_options"] = convert
        if path.endswith(".gz"):
            kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
        ds = ray.data.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported input format: {fmt} ({path})")


def read_duckdb(path: str, query: str | None = None, table: str = "variants",
                shard_keys: list[str] | None = None,
                override_num_blocks: int | None = None) -> ray.data.Dataset:
    """DuckDB-file attach (reference ATTACH DATABASE, database.py:1410-1439)
    via ``ray.data.read_sql`` with a per-task read-only connection factory.
    With ``shard_keys`` a hash-sharded parallel read is attempted (each task
    queries its own key shard); DuckDB's DB-API does not pass Ray's sharding
    probe (MD5-mod syntax), so the call degrades to a single-task stream —
    fine for the attach use-case (side/annotation tables); bulk data flows
    through parquet."""
    def factory():
        import duckdb
        return duckdb.connect(path, read_only=True)

    sql = query or f"SELECT * FROM {table}"
    if shard_keys:
        try:
            return ray.data.read_sql(
                sql, factory, shard_keys=shard_keys,
                override_num_blocks=override_num_blocks)
        except ValueError:
            pass  # connector can't shard -> single-task read below
    return ray.data.read_sql(sql, factory)


def read_sqlite(path: str, query: str | None = None,
                table: str = "variants") -> ray.data.Dataset:
    """SQLite attach (reference sqlite_scan, database.py:1441-1468) via
    ``ray.data.read_sql`` over the stdlib DB-API connection."""
    def factory():
        import sqlite3
        return sqlite3.connect(path)

    return ray.data.read_sql(query or f"SELECT * FROM {table}", factory)


def write_duckdb(ds: ray.data.Dataset, db_path: str,
                 table: str = "variants") -> dict:
    """DuckDB-file writer, the reference's shape exactly (database.py:
    2472-2499): export the Dataset to a parquet directory in parallel, then
    one ``CREATE TABLE ... AS SELECT * FROM read_parquet(...)`` statement
    materializes the table inside the .duckdb file. The distributed work is
    the parquet write; the single-writer step is metadata-sized for DuckDB's
    own columnar ingestion."""
    import duckdb

    import shutil

    tmp_dir = db_path + ".parquet_staging"
    ds.write_parquet(tmp_dir)
    try:
        con = duckdb.connect(db_path)
        try:
            con.execute(f"DROP TABLE IF EXISTS {table}")
            con.execute(f"CREATE TABLE {table} AS "
                        f"SELECT * FROM read_parquet('{tmp_dir}/*.parquet')")
            n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        finally:
            con.close()
    finally:
        # the staging copy must not outlive a failed export either
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return {"db": db_path, "table": table, "n_rows": int(n)}


def write_any(ds: ray.data.Dataset, out_dir: str, fmt: str = "parquet",
              partition_cols: list[str] | None = None,
              min_rows_per_file: int | None = None) -> dict:
    """Extension-dispatched writer + sidecar manifest.

    - parquet: directory of part files; with ``partition_cols`` a
      hive-partitioned layout (reference --parquet_partitions,
      database.py:2774-2780). Partitioned, never one giant file → a rerun
      can skip finished partitions.
    - csv/tsv/psv: delimiter from SEP_TYPE (database.py:2700-2722).
    - json: NDJSON parts (database.py:2725-2759).
    Returns the sidecar dict (also written to <out_dir>.hdr.json — the
    .hdr analog, variants.py:2351-2444)."""
    schema = ds.schema().base_schema
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    if fmt == "parquet":
        if partition_cols:
            ds.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)
        else:
            ds.write_parquet(out_dir, **kwargs)
    elif fmt in ("csv", "tsv", "psv"):
        delim = SEP_TYPE[fmt]

        def _csv_args():
            # build WriteOptions inside the worker: pyarrow option objects
            # don't pickle
            from pyarrow import csv as pacsv
            return {"write_options": pacsv.WriteOptions(delimiter=delim)}

        ds.write_csv(out_dir, arrow_csv_args_fn=_csv_args)
    elif fmt == "json":
        ds.write_json(out_dir)
    else:
        raise ValueError(f"unsupported output format: {fmt}")
    sidecar = {
        "format": fmt,
        "partition_cols": partition_cols or [],
        "schema": {f.name: str(f.type) for f in schema},
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(out_dir.rstrip("/") + ".hdr.json", "w") as f:
        json.dump(sidecar, f, indent=1)
    return sidecar
