"""Metadata-only schema evolution (alter_store rename/drop) + vacuum GC:
logical reads, pushdown on renamed columns, physical fold at maintenance,
append guard, snapshot isolation, sidecar reclamation."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.manifest import load_footer
from howard_ray.pipeline import (
    alter_store,
    append_to_store,
    compact_store,
    decode_store,
    delete_where,
    derive_column,
    encode_dataset,
    vacuum_store,
)

# lambda on purpose: module-level defs in test files are driver-only
_tok_bucket = lambda t: pc.divide(  # noqa: E731
    pc.cast(t["n_tok"], pa.int64()), pa.scalar(64, type=pa.int64()))


def _decoded(st, **kw) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(st, **kw))
    return t.take(pc.sort_indices(t["doc_id"])) if t.num_rows else t


@pytest.fixture()
def store(ray_session, tmp_path):
    src = str(tmp_path / "corpus.parquet")
    write_corpus(src, 2000, seed=11)
    st = str(tmp_path / "store")
    encode_dataset(src, st, mode="cluster", target_rows=300)
    return src, st


def test_rename_and_drop_logical_read(store):
    src, st = store
    r = alter_store(st, rename={"n_tok": "token_count"}, drop=["source"])
    assert r["renamed"] == 1 and r["dropped"] == 1

    full = pq.read_table(src).sort_by("doc_id")
    dec = _decoded(st)
    assert "source" not in dec.column_names
    assert "n_tok" not in dec.column_names
    assert dec["token_count"].combine_chunks().equals(
        full["n_tok"].combine_chunks())
    # pruned read by the NEW name
    only = _decoded(st, columns=["doc_id", "token_count"])
    assert only.column_names == ["doc_id", "token_count"]

    # validation
    with pytest.raises(ValueError):
        alter_store(st, rename={"nope": "x"})
    with pytest.raises(ValueError):
        alter_store(st, rename={"doc_id": "token_count"})
    with pytest.raises(ValueError):
        alter_store(st, drop=["source"])  # already gone


def test_pushdown_and_zone_maps_on_renamed(store):
    src, st = store
    alter_store(st, rename={"n_tok": "token_count"})
    full = pq.read_table(src)
    n_exp = pc.sum(pc.cast(pc.greater_equal(full["n_tok"], 500),
                           pa.int8())).as_py() or 0
    dec = _decoded(st, predicate=("token_count", ">=", 500))
    assert dec.num_rows == n_exp
    # footer stats re-keyed to the logical name
    b0 = load_footer(st)["blocks"][0]
    assert "token_count" in b0["columns"]
    assert "n_tok" not in b0["columns"]
    # delete on the renamed column works too
    delete_where(st, ("token_count", ">=", 500))
    assert _decoded(st).num_rows == full.num_rows - n_exp


def test_rename_derived_and_rename_back(store):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    alter_store(st, rename={"tok_bucket": "bucket"})
    dec = _decoded(st, columns=["doc_id", "bucket"])
    full = pq.read_table(src).sort_by("doc_id")
    exp = pc.divide(pc.cast(full["n_tok"], pa.int64()), 64)
    assert dec["bucket"].combine_chunks().equals(exp.combine_chunks())
    # rename a base column back to its in-file name drops the map entry
    alter_store(st, rename={"n_tok": "nt"})
    alter_store(st, rename={"nt": "n_tok"})
    assert not any(b.get("renames") for b in load_footer(st)["blocks"])


def test_compact_folds_alter_physically(store):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    alter_store(st, rename={"n_tok": "token_count"}, drop=["source"])
    before = _decoded(st)
    compact_store(st, target_rows=2000)
    after = _decoded(st).select(before.column_names)
    assert after.cast(before.schema).equals(before)
    # physically folded: merged blocks carry no read maps
    f = load_footer(st)
    assert not any(b.get("renames") or b.get("drops") for b in f["blocks"])


def test_append_guard_and_new_epoch_names(store, tmp_path):
    src, st = store
    alter_store(st, rename={"n_tok": "token_count"})
    # the original delivery still carries n_tok -> refused
    with pytest.raises(ValueError, match="renamed or dropped"):
        append_to_store(st, src, target_rows=300)
    # a delivery with the NEW name appends cleanly
    t = pq.read_table(src)
    renamed = t.rename_columns(
        [("token_count" if c == "n_tok" else c) for c in t.column_names])
    d2 = str(tmp_path / "d2.parquet")
    pq.write_table(renamed, d2)
    append_to_store(st, d2, target_rows=300)
    dec = _decoded(st)
    assert dec.num_rows == 2 * t.num_rows
    assert "token_count" in dec.column_names and "n_tok" not in dec.column_names


def test_snapshot_keeps_old_schema_and_vacuum_reclaims(store):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    s_before = load_footer(st)["snapshot_id"]
    alter_store(st, rename={"n_tok": "token_count"}, drop=["tok_bucket"])
    # old snapshot: old names, derived column still present
    old = _decoded(st, as_of=s_before)
    assert "n_tok" in old.column_names and "tok_bucket" in old.column_names
    # vacuum keeps the sidecars while the snapshot references them
    assert vacuum_store(st)["files_removed"] == 0
    # drop the snapshot (retention=1 forces it out), then vacuum reclaims
    os.environ["HOWARD_SNAPSHOT_RETAIN"] = "1"
    try:
        alter_store(st, rename={"source": "origin"})  # footer swap prunes
    finally:
        del os.environ["HOWARD_SNAPSHOT_RETAIN"]
    v = vacuum_store(st)
    assert v["files_removed"] > 0 and v["bytes_freed"] > 0
    dec = _decoded(st)
    assert "tok_bucket" not in dec.column_names
    assert "origin" in dec.column_names
