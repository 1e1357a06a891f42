"""Per-block Bloom sidecars: primitive correctness (no false negatives,
bounded false positives), point-lookup pruning on a non-clustered key,
maintenance/vacuum lifecycle, alter re-keying."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray.bloom import (
    bloom_file_name,
    bloom_path,
    build_filter,
    maybe_contains,
    probe_file,
)
from howard_ray.fixtures import write_corpus
from howard_ray.manifest import load_footer
from howard_ray.pipeline import (
    alter_store,
    build_bloom_index,
    compact_store,
    decode_store,
    encode_dataset,
    vacuum_store,
)


def test_filter_primitives_strings_and_ints():
    keys = [f"doc-{i:05d}" for i in range(0, 5000, 3)]
    f = build_filter(pa.array(keys))
    # no false negatives, ever
    for k in keys[::97]:
        assert maybe_contains(f, [k])
    # false positives bounded: ~0.8% expected at 10 bits/key; allow 5%
    absent = [f"doc-{i:05d}" for i in range(1, 5000, 3)]
    fp = sum(maybe_contains(f, [a]) for a in absent) / len(absent)
    assert fp < 0.05, fp

    ints = pa.array(np.arange(0, 10000, 7, dtype=np.int64))
    fi = build_filter(ints)
    assert maybe_contains(fi, [7007])
    miss = [int(x) for x in range(1, 10000, 700)]  # none divisible by 7
    fp_i = sum(maybe_contains(fi, [m]) for m in miss if m % 7) / len(miss)
    assert fp_i < 0.2
    # multi-value probe: any-hit semantics
    assert maybe_contains(fi, [1, 2, 3, 7 * 13])
    # corrupted bitset detected
    bad = f[:20] + bytes([f[20] ^ 0xFF]) + f[21:]
    with pytest.raises(IOError):
        maybe_contains(bad, ["x"])


@pytest.fixture()
def store(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2000, seed=21)
    st = str(tmp_path / "st")
    # cluster mode: blocks clustered by source => doc_id zone maps useless
    encode_dataset(src, st, mode="cluster", target_rows=300)
    return src, st


def _decoded(st, **kw) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(st, **kw))
    return t.take(pc.sort_indices(t["doc_id"])) if t.num_rows else t


def test_point_lookup_with_and_without_bloom(store):
    src, st = store
    full = pq.read_table(src)
    targets = full["doc_id"].to_pylist()[::500]  # a few real ids
    before = _decoded(st, predicate=("doc_id", "in", targets))

    r = build_bloom_index(st, "doc_id")
    assert r["n_blocks_indexed"] == load_footer(st)["n_blocks"]
    after = _decoded(st, predicate=("doc_id", "in", targets))
    assert after.equals(before)
    assert after.num_rows == len(targets)

    # a value that exists nowhere: every per-block filter must reject it
    # (deterministically: 'absent!' can't collide with all k probes of all
    # blocks at these sizes — observed fp-free; equality result proves it)
    missing = _decoded(st, predicate=("doc_id", "==", "no-such-doc!"))
    assert missing.num_rows == 0
    f = load_footer(st)
    n_reject = sum(
        not probe_file(bloom_path(st, b["blooms"]["doc_id"]),
                       ["no-such-doc!"])
        for b in f["blocks"])
    assert n_reject >= int(0.9 * f["n_blocks"])  # pruning actually happens

    # idempotent backfill
    assert build_bloom_index(st, "doc_id")["n_blocks_indexed"] == 0
    with pytest.raises(ValueError):
        build_bloom_index(st, "nope")


def test_bloom_lifecycle_alter_compact_vacuum(store):
    src, st = store
    build_bloom_index(st, "doc_id")
    alter_store(st, rename={"doc_id": "id"})
    f = load_footer(st)
    assert all("id" in b["blooms"] for b in f["blocks"])
    from howard_ray.ops.util import to_table
    hit = to_table(decode_store(
        st, predicate=("id", "==",
                       pq.read_table(src)["doc_id"][0].as_py())))
    assert hit.num_rows == 1 and "id" in hit.column_names

    compact_store(st, target_rows=2000)
    f2 = load_footer(st)
    # merged blocks dropped their blooms (files GC'd with the members)...
    on_disk = set(os.listdir(os.path.join(st, "blooms")))
    referenced = {v for b in f2["blocks"]
                  for v in (b.get("blooms") or {}).values()}
    assert referenced <= on_disk
    # ...and backfill re-indexes exactly the un-indexed blocks
    r = build_bloom_index(st, "id")
    assert r["n_blocks_indexed"] == sum(
        1 for b in f2["blocks"] if "id" not in (b.get("blooms") or {}))
    # vacuum with retention=1 clears orphans left by expired snapshots
    os.environ["HOWARD_SNAPSHOT_RETAIN"] = "1"
    try:
        alter_store(st, rename={"id": "doc_id"})
    finally:
        del os.environ["HOWARD_SNAPSHOT_RETAIN"]
    vacuum_store(st)
    on_disk = set(os.listdir(os.path.join(st, "blooms")))
    referenced = {v for b in load_footer(st)["blocks"]
                  for v in (b.get("blooms") or {}).values()}
    assert on_disk == referenced


def test_token_presence_contains(ray_session, tmp_path):
    """'contains' predicate over the list<int> tokens column: Bloom built
    over each block's DISTINCT token ids, zone maps prune by value range,
    the mask is flatten+searchsorted; delete_where composes (GDPR 'remove
    every sequence containing token X')."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from howard_ray.fixtures import write_corpus
    from howard_ray.pipeline import (build_bloom_index, decode_store,
                                     delete_where, encode_dataset)

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2500, seed=23)
    st = str(tmp_path / "st")
    encode_dataset(src, st, mode="cluster", target_rows=400)
    r = build_bloom_index(st, "tokens")
    assert r["n_blocks_indexed"] > 0

    t = pq.read_table(src)
    arr = t["tokens"].combine_chunks()
    flat = np.asarray(arr.flatten())
    lengths = np.asarray(pc.list_value_length(arr), dtype=np.int64)

    for tok in (49_000, 5, 31_999):
        rows = np.unique(np.searchsorted(np.cumsum(lengths),
                                         np.nonzero(flat == tok)[0],
                                         side="right"))
        truth = set(np.asarray(t["doc_id"])[rows].tolist())
        got = decode_store(st, columns=["doc_id"],
                           predicate=("tokens", "contains", tok)).to_pandas()
        got_ids = set(got["doc_id"]) if len(got) else set()
        assert got_ids == truth, tok

    # conjunction with a scalar predicate
    tok = 5
    rows = np.unique(np.searchsorted(np.cumsum(lengths),
                                     np.nonzero(flat == tok)[0],
                                     side="right"))
    n_tok_v = np.asarray(t["n_tok"])[rows]
    got = decode_store(st, columns=["doc_id"],
                       predicate=[("tokens", "contains", tok),
                                  ("n_tok", ">=", 100)]).to_pandas()
    assert len(got) == int((n_tok_v >= 100).sum())

    # erasure by token containment
    dl = delete_where(st, ("tokens", "contains", 49_000))
    assert decode_store(st, columns=["doc_id"],
                        predicate=("tokens", "contains",
                                   49_000)).count() == 0


def test_bloom_nullable_bigint_no_false_negative():
    """Nulls in the indexed column must not push big ints through float64
    (hash mismatch = false negative = wrongly pruned block)."""
    import pyarrow as pa

    from howard_ray.bloom import build_filter, maybe_contains

    f = build_filter(pa.array([2**53 + 1, 5, None], type=pa.int64()))
    assert maybe_contains(f, [2**53 + 1])
    assert maybe_contains(f, [5])
