"""upsert_to_store (MERGE by key): replace + insert semantics, retry
convergence, compaction folding the tombstoned old versions away."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.pipeline import (
    compact_store,
    decode_store,
    encode_dataset,
    upsert_to_store,
)


def _decoded(st, **kw) -> pa.Table:
    from howard_ray.ops.util import to_table
    t = to_table(decode_store(st, **kw))
    return t.take(pc.sort_indices(t["doc_id"])) if t.num_rows else t


@pytest.fixture()
def setup(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1500, seed=17)
    t = pq.read_table(src)
    st = str(tmp_path / "st")
    encode_dataset(src, st, mode="cluster", target_rows=300)

    # delta: first 100 rows REPLACED with n_tok+7777, plus 10 NEW keys
    delta = t.slice(0, 100)
    i = delta.column_names.index("n_tok")
    delta = delta.set_column(
        i, "n_tok", pc.add(delta["n_tok"], 7777).cast(delta["n_tok"].type))
    new = t.slice(100, 10)
    new = new.set_column(new.column_names.index("doc_id"), "doc_id",
                         pa.array([f"new-{k:05d}" for k in range(10)]))
    dpath = str(tmp_path / "delta.parquet")
    pq.write_table(pa.concat_tables([delta, new]), dpath)
    return t, delta, new, st, dpath


def test_upsert_replaces_and_inserts(setup):
    t, delta, new, st, dpath = setup
    r = upsert_to_store(st, dpath, key="doc_id", target_rows=300)
    assert r["n_keys"] == 110
    assert r["n_replaced"] == 100 and r["n_inserted"] == 10

    dec = _decoded(st)
    assert dec.num_rows == t.num_rows + 10
    # replaced keys carry the delta's values
    got = dec.filter(pc.is_in(dec["doc_id"], value_set=delta["doc_id"]))
    exp = delta.sort_by("doc_id")
    assert got.sort_by("doc_id")["n_tok"].combine_chunks().equals(
        exp["n_tok"].combine_chunks())
    # inserted keys present
    assert dec.filter(pc.is_in(dec["doc_id"],
                               value_set=new["doc_id"])).num_rows == 10


def test_upsert_retry_converges(setup):
    t, delta, new, st, dpath = setup
    upsert_to_store(st, dpath, key="doc_id", target_rows=300)
    before = _decoded(st)
    # a blind full re-run (crash-retry at the coarsest granularity)
    upsert_to_store(st, dpath, key="doc_id", target_rows=300)
    after = _decoded(st)
    assert after.equals(before)
    # compaction folds the tombstoned old versions physically
    compact_store(st, target_rows=2000)
    assert _decoded(st).equals(before)
