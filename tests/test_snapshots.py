"""Footer snapshots / time travel: every footer swap archives a snapshot,
additive ops (append, derive) keep older snapshots readable, destructive
maintenance (compact, purge) expires them, deletes pierce them (erasure),
and retention bounds the archive."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.manifest import list_snapshot_ids, list_snapshots, load_footer
from howard_ray.pipeline import (
    append_to_store,
    compact_store,
    decode_store,
    delete_where,
    derive_column,
    encode_dataset,
    purge_deletes,
)


def _decoded(st, **kw) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(st, **kw))
    return t.take(pc.sort_indices(t["doc_id"])) if t.num_rows else t


@pytest.fixture()
def split_store(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2000, seed=7)
    t = pq.read_table(src)
    even = pa.array([int(s[-1]) % 2 == 0 for s in t["doc_id"].to_pylist()])
    d1, d2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(t.filter(even), d1)
    pq.write_table(t.filter(pc.invert(even)), d2)
    st = str(tmp_path / "st")
    f1 = encode_dataset(d1, st, mode="cluster", target_rows=300)
    return t, even, d2, st, f1["snapshot_id"]


def test_append_keeps_snapshot_readable(split_store):
    t, even, d2, st, s1 = split_store
    f2 = append_to_store(st, d2, mode="cluster", target_rows=300)
    s2 = f2["snapshot_id"]
    assert s2 > s1

    old = _decoded(st, as_of=s1)
    exp_old = t.filter(even).sort_by("doc_id")
    assert old.select(exp_old.column_names).cast(exp_old.schema) \
        .equals(exp_old)
    now = _decoded(st)
    assert now.num_rows == t.num_rows
    assert _decoded(st, as_of=s2).num_rows == t.num_rows


def test_derive_keeps_snapshot_schema(split_store):
    t, even, d2, st, s1 = split_store
    res_sid = load_footer(st)["snapshot_id"]
    derive_column(st, "tok_bucket",
                  lambda tb: pc.divide(pc.cast(tb["n_tok"], pa.int64()), 64),
                  ["n_tok"])
    s_derived = load_footer(st)["snapshot_id"]
    assert s_derived > res_sid
    # the pre-derive snapshot has no tok_bucket; the post-derive one does
    assert "tok_bucket" not in _decoded(st, as_of=s1).column_names
    assert "tok_bucket" in _decoded(st, as_of=s_derived).column_names


def test_delete_pierces_snapshots(split_store):
    t, even, d2, st, s1 = split_store
    append_to_store(st, d2, mode="cluster", target_rows=300)
    n_web = pc.sum(pc.cast(pc.equal(t["source"], "web"),
                           pa.int8())).as_py() or 0
    delete_where(st, ("source", "==", "web"))
    # erasure semantics: the delete is visible even through the OLD snapshot
    old = _decoded(st, as_of=s1)
    assert old.num_rows == pc.sum(pc.cast(
        pc.and_(even, pc.invert(pc.equal(t["source"], "web"))),
        pa.int8())).as_py()
    assert _decoded(st).num_rows == t.num_rows - n_web


@pytest.mark.parametrize("op", ["compact", "purge"])
def test_maintenance_expires_snapshots(split_store, op):
    t, even, d2, st, s1 = split_store
    append_to_store(st, d2, mode="cluster", target_rows=300)
    if op == "compact":
        compact_store(st, target_rows=2000)
    else:
        delete_where(st, ("source", "==", "web"))
        purge_deletes(st)
    live_sid = load_footer(st)["snapshot_id"]
    assert s1 not in list_snapshot_ids(st)
    assert live_sid in list_snapshot_ids(st)
    with pytest.raises(FileNotFoundError):
        decode_store(st, as_of=s1)
    # live snapshot still decodes
    assert _decoded(st, as_of=live_sid).num_rows == _decoded(st).num_rows


def test_retention_bounds_archive(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("HOWARD_SNAPSHOT_RETAIN", "3")
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 400, seed=3)
    st = str(tmp_path / "st")
    encode_dataset(src, st, mode="stream", target_rows=100)
    for i in range(4):  # footer swap per derive
        derive_column(st, f"d{i}",
                      lambda tb: pc.cast(tb["n_tok"], pa.int64()), ["n_tok"])
    ids = list_snapshot_ids(st)
    assert len(ids) == 3
    rows = list_snapshots(st)
    assert [r["snapshot_id"] for r in rows] == ids
    assert all(r["n_rows"] == 400 for r in rows)
