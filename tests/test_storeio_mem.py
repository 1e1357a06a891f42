"""The ``mem://`` backend is NOT path-mappable (no local path exists for
any key; ``supports_replace = False``), so a green full-lifecycle run here
proves the store works against true object-store semantics: every
block/footer/manifest/tombstone operation goes through handler-object
calls, atomic publish degrades to whole-object PUT + temp delete, and Ray
worker processes reach the same backend via the named mem-store actor —
no shared filesystem anywhere in the path."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray import storeio as sio
from howard_ray.fixtures import write_corpus
from howard_ray.manifest import load_footer
from howard_ray.pipeline import (append_to_store, compact_store,
                                 decode_store, delete_where, encode_dataset,
                                 recluster_store, store_total_bytes,
                                 vacuum_store)


def test_mem_not_path_mappable():
    assert sio.local_path("mem://t/x") is None
    with pytest.raises(ValueError, match="not path-mappable"):
        sio.resolve("mem://t/x")


def test_mem_handler_basics(ray_session):
    base = "mem://unit"
    sio.makedirs(sio.join(base, "d"))
    assert sio.isdir(sio.join(base, "d"))
    with sio.sopen(sio.join(base, "d", "a.txt"), "w") as f:
        f.write("hello")
    with sio.sopen(sio.join(base, "d", "a.txt"), "a") as f:
        f.write(" world")
    with sio.sopen(sio.join(base, "d", "a.txt")) as f:
        assert f.read() == "hello world"
    assert sio.getsize(sio.join(base, "d", "a.txt")) == 11
    assert sio.listdir(sio.join(base, "d")) == ["a.txt"]
    # publish path without rename: copy-PUT + delete
    with sio.sopen(sio.join(base, "d", "b.tmp"), "wb") as f:
        f.write(b"\x00\x01")
    sio.replace(sio.join(base, "d", "b.tmp"), sio.join(base, "d", "b.bin"))
    assert not sio.exists(sio.join(base, "d", "b.tmp"))
    with sio.sopen(sio.join(base, "d", "b.bin"), "rb") as f:
        assert f.read() == b"\x00\x01"
    assert sorted(sio.walk_files(sio.join(base, "d"))) == [
        "mem://unit/d/a.txt", "mem://unit/d/b.bin"]
    sio.remove(sio.join(base, "d", "b.bin"))
    with pytest.raises(FileNotFoundError):
        sio.getsize(sio.join(base, "d", "b.bin"))
    with pytest.raises(FileNotFoundError):
        sio.sopen(sio.join(base, "d", "missing"), "rb")


@pytest.fixture()
def mem_corpus(tmp_path):
    src = str(tmp_path / "corpus.parquet")
    write_corpus(src, 2000, seed=11)
    t = pq.read_table(src)
    half = pa.array([int(s[-1]) % 2 == 0 for s in t["doc_id"].to_pylist()])
    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    pq.write_table(t.filter(half), d1)
    pq.write_table(t.filter(pc.invert(half)), d2)
    return src, d1, d2, "mem://lc/store"


def test_full_lifecycle_on_mem_backend(ray_session, mem_corpus):
    src, d1, d2, store = mem_corpus
    cwd_entries = set(os.listdir("."))

    # encode
    f1 = encode_dataset(d1, store, mode="stream", target_rows=400)
    assert f1["n_rows"] == pq.read_metadata(d1).num_rows
    assert sio.isdir(sio.join(store, "blocks"))
    assert sio.exists(sio.join(store, "footer.json"))

    # resume: re-encode is a no-op (manifest diff through the layer);
    # no mtime on mem, so compare the lineage log content itself
    with sio.sopen(sio.join(store, "manifest.jsonl")) as f:
        before = f.read()
    encode_dataset(d1, store, mode="stream", target_rows=400)
    with sio.sopen(sio.join(store, "manifest.jsonl")) as f:
        assert f.read() == before

    # append + decode bit-identical
    f2 = append_to_store(store, d2, mode="stream", target_rows=400)
    assert f2["n_rows"] == pq.read_metadata(src).num_rows
    from howard_ray.ops.util import to_table
    dec = to_table(decode_store(store))
    srct = pq.read_table(src)
    dec = dec.select(srct.column_names).take(pc.sort_indices(dec["doc_id"]))
    assert dec.equals(srct.take(pc.sort_indices(srct["doc_id"])))

    # delete + compact + vacuum + recluster, all through handler calls
    delete_where(store, ("source", "==", "web"))
    dec2 = to_table(decode_store(store))
    assert "web" not in set(dec2["source"].to_pylist())
    compact_store(store, target_rows=1000)
    vacuum_store(store)
    assert store_total_bytes(store) > 0
    assert load_footer(store)["n_rows"] == dec2.num_rows
    recluster_store(store, "doc_id")
    dec3 = to_table(decode_store(store))
    assert dec3.num_rows == dec2.num_rows
    ids2 = sorted(dec2["doc_id"].to_pylist())
    assert sorted(dec3["doc_id"].to_pylist()) == ids2

    # zone-pruned selective decode still works on mem
    lo = ids2[len(ids2) // 2]
    sel = to_table(decode_store(store, predicate=("doc_id", ">=", lo)))
    assert sel.num_rows == sum(1 for x in ids2 if x >= lo)

    # nothing leaked to the local filesystem: no literal 'mem:' path
    assert not os.path.exists("mem:")
    assert set(os.listdir(".")) == cwd_entries
