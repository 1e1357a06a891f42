"""Tests: format surface (sources.py), store stats report, multimodal
pipeline, encode profiles."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def small_table():
    return pa.table({
        "a": pa.array([1, 2, 3], type=pa.int64()),
        "b": pa.array(["x", "y", "z"]),
    })


def test_read_write_roundtrip_formats(ray_session, tmp_path, small_table):
    from howard_ray.sources import read_any, write_any

    src = str(tmp_path / "in.parquet")
    pq.write_table(small_table, src)

    for fmt in ["parquet", "csv", "tsv", "json"]:
        out = str(tmp_path / f"out_{fmt}")
        ds = read_any(src)
        sidecar = write_any(ds, out, fmt=fmt)
        assert sidecar["schema"] == {"a": "int64", "b": "string"}
        assert os.path.exists(out + ".hdr.json")
        back = read_any_dir(out, fmt)
        got = back.to_pandas().sort_values("a").reset_index(drop=True)
        assert list(got["a"]) == [1, 2, 3]
        assert list(got["b"]) == ["x", "y", "z"]


def read_any_dir(out_dir: str, fmt: str):
    """Read back a written directory (delimiter-aware)."""
    import ray.data as rd

    from howard_ray.sources import SEP_TYPE
    files = [os.path.join(out_dir, f) for f in os.listdir(out_dir)]
    if fmt == "parquet":
        return rd.read_parquet(out_dir)
    if fmt == "json":
        return rd.read_json(files)
    from pyarrow import csv as pacsv
    return rd.read_csv(files, parse_options=pacsv.ParseOptions(
        delimiter=SEP_TYPE.get(fmt, ",")))


def test_write_partitioned(ray_session, tmp_path):
    from howard_ray.sources import read_any, write_any

    t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    src = str(tmp_path / "p.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "by_k")
    write_any(read_any(src), out, fmt="parquet", partition_cols=["k"])
    subdirs = {d for d in os.listdir(out) if "=" in d}
    assert subdirs == {"k=a", "k=b"}


def test_store_report(ray_session, tmp_path):
    from howard_ray.fixtures import write_corpus
    from howard_ray.pipeline import encode_dataset
    from howard_ray.stats import store_report

    src = write_corpus(str(tmp_path / "c.parquet"), 2000)
    store = str(tmp_path / "store")
    encode_dataset(src, store, mode="cluster", target_rows=500)
    rep = store_report(store)
    assert rep["n_rows"] == 2000
    assert rep["compression_ratio"] > 1
    assert rep["codec_blocks"]
    assert "web" in rep["per_source"]


def test_media_pipeline(ray_session):
    from howard_ray.ops.multimodal import media_features

    out = media_features("unused")
    assert out["n"].sum() == 2000
    assert set(out["aspect_gt_1"]) <= {0, 1}


def test_archive_profile_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as _pq

    from howard_ray.fixtures import write_corpus
    from howard_ray.pipeline import decode_store, encode_dataset, store_total_bytes

    src = write_corpus(str(tmp_path / "c.parquet"), 1500)
    st_std = str(tmp_path / "std")
    st_arc = str(tmp_path / "arc")
    encode_dataset(src, st_std, mode="stream", target_rows=500, profile="standard")
    encode_dataset(src, st_arc, mode="stream", target_rows=500, profile="archive")
    import ray
    a = pa.concat_tables(ray.get(decode_store(st_arc).to_arrow_refs()))
    orig = _pq.read_table(src)
    import pyarrow.compute as pc
    a = a.take(pc.sort_indices(a, sort_keys=[("doc_id", "ascending")]))
    o = orig.take(pc.sort_indices(orig, sort_keys=[("doc_id", "ascending")]))
    for c in o.column_names:
        assert a[c].combine_chunks().equals(o[c].cast(a[c].type).combine_chunks())
    # archive must not be larger than standard
    assert store_total_bytes(st_arc) <= store_total_bytes(st_std) * 1.02


def test_variants_fixture_deterministic(tmp_path):
    import pyarrow as pa

    from howard_ray.ops import vfix

    t = pa.table({"l_orderkey": list(range(1, 251)),
                  "l_linenumber": [1 + i % 7 for i in range(250)]})
    a = vfix.gen_variants_batch(t)
    b = vfix.gen_variants_batch(t)
    assert a.equals(b)
    assert a.num_rows == 250 * vfix.FANOUT
    # sf-independent store twins are deterministic too
    assert vfix.gen_transcripts().equals(vfix.gen_transcripts())
    assert vfix.gen_genome_chrom(3) == vfix.gen_genome_chrom(3)
    assert len(vfix.gen_genome_chrom(0)) == vfix.GENOME_LEN


def test_duckdb_attach_roundtrip(ray_session, tmp_path):
    """write_duckdb -> read_duckdb round-trip (reference ATTACH/CREATE
    TABLE AS path, database.py:1410-1468 / 2472-2499)."""
    import ray.data

    from howard_ray.sources import read_duckdb, write_duckdb

    src = ray.data.read_parquet("/root/testdata/sf0.001/nation.parquet")
    db = str(tmp_path / "t.duckdb")
    info = write_duckdb(src, db, table="nation")
    assert info["n_rows"] == src.count()
    back = read_duckdb(db, table="nation").to_pandas()
    orig = src.to_pandas()
    assert sorted(back["n_name"]) == sorted(orig["n_name"])
    # query form + shard-keyed call (degrades to single-task on DuckDB)
    q = read_duckdb(db, query="SELECT n_nationkey FROM nation WHERE n_nationkey < 5",
                    shard_keys=["n_nationkey"], override_num_blocks=2).to_pandas()
    assert len(q) == 5


def test_sqlite_attach(ray_session, tmp_path):
    import sqlite3

    from howard_ray.sources import read_sqlite

    db = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE v (k INTEGER, s TEXT)")
    con.executemany("INSERT INTO v VALUES (?, ?)", [(i, f"s{i}") for i in range(10)])
    con.commit(); con.close()
    out = read_sqlite(db, table="v").to_pandas()
    assert len(out) == 10 and set(out.columns) == {"k", "s"}
