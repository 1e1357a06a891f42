"""Schema evolution via derived sidecar columns: per-block column files,
pruned reads, pushdown + zone maps on derived columns, deletes on derived
predicates, fold-in at compaction/purge, backfill after append."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.manifest import load_footer
from howard_ray.pipeline import (
    append_to_store,
    compact_store,
    decode_store,
    delete_where,
    derive_column,
    encode_dataset,
    purge_deletes,
)


# Deterministic derived column: n_tok // 64 (int64). A lambda on purpose:
# cloudpickle serializes lambdas BY VALUE, while a module-level def in a
# test file is pickled by reference and Ray workers cannot import
# `test_derive` (pytest rootdir modules are driver-only).
_tok_bucket = lambda t: pc.divide(  # noqa: E731
    pc.cast(t["n_tok"], pa.int64()), pa.scalar(64, type=pa.int64()))


@pytest.fixture()
def store(ray_session, tmp_path):
    src = str(tmp_path / "corpus.parquet")
    write_corpus(src, 2000, seed=42)
    st = str(tmp_path / "store")
    encode_dataset(src, st, mode="cluster", target_rows=300)
    return src, st


def _decoded(st, **kw) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(st, **kw))
    return t.take(pc.sort_indices(t["doc_id"])) if t.num_rows else t


def test_derive_values_and_pruned_read(store):
    src, st = store
    res = derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    assert res["n_blocks_derived"] == load_footer(st)["n_blocks"]
    assert res["ext_bytes"] > 0

    full = pq.read_table(src).sort_by("doc_id")
    dec = _decoded(st, columns=["doc_id", "n_tok", "tok_bucket"])
    exp = pc.divide(pc.cast(full["n_tok"], pa.int64()), 64)
    assert dec["tok_bucket"].combine_chunks().equals(exp.combine_chunks())

    # idempotent: nothing left to derive
    assert derive_column(st, "tok_bucket", _tok_bucket,
                         ["n_tok"])["n_blocks_derived"] == 0
    # base-column collision refused
    with pytest.raises(ValueError):
        derive_column(st, "n_tok", _tok_bucket, ["n_tok"])


def test_pushdown_and_zone_pruning_on_derived(store):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    dec = _decoded(st, predicate=("tok_bucket", ">=", 8))
    full = pq.read_table(src)
    n_exp = pc.sum(pc.cast(pc.greater_equal(
        pc.divide(pc.cast(full["n_tok"], pa.int64()), 64), 8),
        pa.int8())).as_py() or 0
    assert dec.num_rows == n_exp
    if dec.num_rows:
        assert pc.min(dec["tok_bucket"]).as_py() >= 8
    # zone maps on the derived column exist in the footer
    footer = load_footer(st)
    st_stats = footer["blocks"][0]["columns"]["tok_bucket"]["stats"]
    assert "min" in st_stats and "max" in st_stats


def test_delete_on_derived_column(store):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    r = delete_where(st, ("tok_bucket", "<", 2))
    full = pq.read_table(src)
    buckets = pc.divide(pc.cast(full["n_tok"], pa.int64()), 64)
    n_dead = pc.sum(pc.cast(pc.less(buckets, 2), pa.int8())).as_py() or 0
    assert r["n_deleted_new"] == n_dead
    assert _decoded(st).num_rows == full.num_rows - n_dead


@pytest.mark.parametrize("op", ["compact", "purge"])
def test_maintenance_folds_derived(store, op):
    src, st = store
    derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    delete_where(st, ("source", "==", "web"))
    before = _decoded(st)
    if op == "compact":
        compact_store(st, target_rows=300)
    else:
        purge_deletes(st)
    after = _decoded(st).select(before.column_names)
    assert after.cast(before.schema).equals(before)
    # no orphan sidecars: every ext file in the footer exists, and every
    # on-disk sidecar is referenced
    footer = load_footer(st)
    refs = {f for b in footer["blocks"]
            for f in (b.get("ext_files") or {}).values()}
    on_disk = {f for f in os.listdir(os.path.join(st, "blocks"))
               if ".c_" in f}
    assert refs == on_disk


def test_backfill_after_append(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2000, seed=9)
    t = pq.read_table(src)
    even = pa.array([int(s[-1]) % 2 == 0 for s in t["doc_id"].to_pylist()])
    d1, d2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(t.filter(even), d1)
    pq.write_table(t.filter(pc.invert(even)), d2)

    st = str(tmp_path / "st")
    encode_dataset(d1, st, mode="cluster", target_rows=300)
    r1 = derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    append_to_store(st, d2, mode="cluster", target_rows=300)
    r2 = derive_column(st, "tok_bucket", _tok_bucket, ["n_tok"])
    assert r1["n_blocks_derived"] > 0 and r2["n_blocks_derived"] > 0
    assert (r1["n_blocks_derived"] + r2["n_blocks_derived"]
            == load_footer(st)["n_blocks"])

    dec = _decoded(st, columns=["doc_id", "n_tok", "tok_bucket"])
    assert dec.num_rows == t.num_rows
    exp = pc.divide(pc.cast(dec["n_tok"], pa.int64()), 64)
    assert dec["tok_bucket"].combine_chunks().equals(exp.combine_chunks())
