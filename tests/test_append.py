"""Incremental store append: epoch-namespaced blocks, untouched prior
epochs, union footer, retry-resume, compaction interplay.

Reference behavior generalized: skip-if-done delivery ingest during
database builds (howard/functions/databases.py:2112-2124)."""

import os

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
    encode_dataset,
)


@pytest.fixture(scope="module")
def deliveries(tmp_path_factory):
    """One corpus split into two disjoint deliveries by doc_id parity."""
    root = tmp_path_factory.mktemp("deliveries")
    full = str(root / "full.parquet")
    write_corpus(full, 4000, seed=42)
    t = pq.read_table(full)
    even = pa.array([int(s[-1]) % 2 == 0 for s in t["doc_id"].to_pylist()])
    d1, d2 = str(root / "d1.parquet"), str(root / "d2.parquet")
    pq.write_table(t.filter(even), d1)
    pq.write_table(t.filter(pc.invert(even)), d2)
    return full, d1, d2


def _decoded(store) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(store))
    return t.take(pc.sort_indices(t["doc_id"]))


@pytest.mark.parametrize("mode", ["stream", "cluster"])
def test_append_union_bit_identical(ray_session, deliveries, tmp_path, mode):
    full, d1, d2 = deliveries
    store = str(tmp_path / f"store_{mode}")
    f1 = encode_dataset(d1, store, mode=mode, target_rows=500)
    before_ids = {b["block_id"] for b in f1["blocks"]}
    f2 = append_to_store(store, d2, mode=mode, target_rows=500)

    assert f2["append_epoch"] == 1
    after = {b["block_id"]: b for b in f2["blocks"]}
    # every prior block survives the append verbatim
    assert before_ids <= set(after)
    new_ids = set(after) - before_ids
    assert new_ids and all(i.startswith("a01=") for i in new_ids)
    assert f2["n_rows"] == f1["n_rows"] + pq.read_metadata(d2).num_rows

    src = pq.read_table(full)
    src = src.take(pc.sort_indices(src["doc_id"]))
    dec = _decoded(store).select(src.column_names).cast(src.schema)
    assert dec.equals(src)


def test_second_append_new_epoch(ray_session, deliveries, tmp_path):
    _, d1, d2 = deliveries
    store = str(tmp_path / "store2")
    encode_dataset(d1, store, mode="cluster", target_rows=500)
    append_to_store(store, d2, mode="cluster", target_rows=500)
    # third delivery: reuse d1's rows rewritten with fresh doc_ids
    t = pq.read_table(d1)
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pc.binary_join_element_wise(
                         pa.array(["x"] * t.num_rows), t["doc_id"], ""))
    d3 = str(tmp_path / "d3.parquet")
    pq.write_table(t, d3)
    f3 = append_to_store(store, d3, mode="cluster", target_rows=500)
    assert f3["append_epoch"] == 2
    assert any(b["block_id"].startswith("a02=") for b in f3["blocks"])
    assert f3["n_rows"] == 4000 + t.num_rows


def test_append_retry_resumes_same_epoch(ray_session, deliveries, tmp_path):
    """A crashed append (blocks written, footer never swapped) retries into
    the SAME epoch and skips completed blocks via the lineage manifest."""
    _, d1, d2 = deliveries
    store = str(tmp_path / "store3")
    encode_dataset(d1, store, mode="cluster", target_rows=500)
    footer_before = load_footer(store)

    f2 = append_to_store(store, d2, mode="cluster", target_rows=500)
    new_recs = [b for b in f2["blocks"] if b["block_id"].startswith("a01=")]
    assert new_recs
    # simulate the crash: restore the pre-append footer (blocks stay on disk)
    from howard_ray.manifest import write_footer
    write_footer(store, footer_before["blocks"],
                 extra={k: v for k, v in footer_before.items()
                        if k not in ("version", "n_blocks", "n_rows",
                                     "encoded_bytes", "blocks")})
    f2r = append_to_store(store, d2, mode="cluster", target_rows=500)
    assert f2r["append_epoch"] == 1  # same epoch, not 2
    retried = {b["block_id"]: b for b in f2r["blocks"]
               if b["block_id"].startswith("a01=")}
    assert set(retried) == {b["block_id"] for b in new_recs}
    assert all(b.get("resumed") for b in retried.values())


def test_compact_after_append_preserves_epoch_counter(
        ray_session, deliveries, tmp_path):
    full, d1, d2 = deliveries
    store = str(tmp_path / "store4")
    encode_dataset(d1, store, mode="cluster", target_rows=500)
    append_to_store(store, d2, mode="cluster", target_rows=500)
    compact_store(store, target_rows=500)
    footer = load_footer(store)
    assert footer.get("append_epoch") == 1  # survives the footer rewrite

    src = pq.read_table(full)
    src = src.take(pc.sort_indices(src["doc_id"]))
    dec = _decoded(store).select(src.column_names).cast(src.schema)
    assert dec.equals(src)


def test_read_changes_incremental_feed(ray_session, tmp_path):
    """Change feed decodes exactly the appended delta; a compaction between
    snapshots breaks the feed loudly (rewritten blocks must never replay);
    feed from the latest snapshot is empty."""
    import pyarrow.parquet as pq
    import pytest

    from howard_ray.fixtures import write_corpus
    from howard_ray.manifest import load_footer
    from howard_ray.pipeline import (append_to_store, compact_store,
                                     encode_dataset, read_changes)

    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    write_corpus(d1, 800, seed=51)
    write_corpus(d2, 500, seed=52, variant="shifted")
    st = str(tmp_path / "st_cdc")
    encode_dataset(d1, st, mode="stream", target_rows=300)
    base = load_footer(st)["snapshot_id"]
    append_to_store(st, d2, mode="stream", target_rows=300)

    feed = read_changes(st, base).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    exp = pq.read_table(d2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(feed) == len(exp)
    assert feed["doc_id"].tolist() == exp["doc_id"].tolist()
    assert feed["n_tok"].sum() == exp["n_tok"].sum()

    latest = load_footer(st)["snapshot_id"]
    assert read_changes(st, latest).count() == 0

    compact_store(st, target_rows=2000)
    # a rewrite between the snapshots breaks the feed LOUDLY: either the
    # baseline snapshot was eagerly expired by the rewrite
    # (FileNotFoundError) or, if still retained, the block-diff guard
    # rejects replaying rewritten rows (ValueError)
    with pytest.raises((ValueError, FileNotFoundError)):
        read_changes(st, base)
