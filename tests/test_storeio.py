"""Pluggable block I/O (howard_ray/storeio.py): the full store lifecycle —
encode → decode → append → compact → delete/vacuum — runs against a
``shim://`` URI store, proving every block/footer/manifest/tombstone
operation routes through the URI layer (the multi-node object-store
requirement). A bypassed call would act on a literal ``shim:`` path and
fail (or leave a literal directory, asserted against)."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray import storeio as sio
from howard_ray.fixtures import write_corpus
from howard_ray.manifest import load_footer
from howard_ray.pipeline import (append_to_store, compact_store,
                                 decode_store, delete_where, encode_dataset,
                                 store_total_bytes, vacuum_store)


def test_uri_resolution():
    assert sio.resolve("/plain/path") == "/plain/path"
    assert sio.resolve("shim://s/x.json").startswith("/tmp/howard_shim")
    assert sio.resolve("file:///a/b") == "/a/b"
    with pytest.raises(ValueError, match="unknown store URI scheme"):
        sio.resolve("s3://bucket/key")
    sio.register_scheme("s3", lambda rest: "/tmp/fake_s3/" + rest)
    assert sio.resolve("s3://bucket/key") == "/tmp/fake_s3/bucket/key"
    assert sio.join("shim://a", "b", "c") == "shim://a/b/c"
    # os.path.join is scheme-transparent for our URI format (store code
    # relies on this)
    assert os.path.join("shim://a", "b") == "shim://a/b"


@pytest.fixture()
def shim_store(tmp_path):
    shutil.rmtree("/tmp/howard_shim/t1", ignore_errors=True)
    src = str(tmp_path / "corpus.parquet")
    write_corpus(src, 2000, seed=7)
    t = pq.read_table(src)
    half = pa.array([int(s[-1]) % 2 == 0 for s in t["doc_id"].to_pylist()])
    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    pq.write_table(t.filter(half), d1)
    pq.write_table(t.filter(pc.invert(half)), d2)
    yield src, d1, d2, "shim://t1/store"
    shutil.rmtree("/tmp/howard_shim/t1", ignore_errors=True)


def test_full_lifecycle_through_uri_layer(ray_session, shim_store):
    src, d1, d2, store = shim_store
    cwd_entries = set(os.listdir("."))

    f1 = encode_dataset(d1, store, mode="stream", target_rows=400)
    assert f1["n_rows"] == pq.read_metadata(d1).num_rows
    # the store physically lives under the shim root, not at a literal path
    root = sio.resolve(store)
    assert os.path.isdir(os.path.join(root, "blocks"))
    assert os.path.exists(os.path.join(root, "footer.json"))

    # resume: re-encode is a no-op (manifest diff through the layer)
    before = os.path.getmtime(os.path.join(root, "manifest.jsonl"))
    encode_dataset(d1, store, mode="stream", target_rows=400)
    assert os.path.getmtime(os.path.join(root, "manifest.jsonl")) == before

    f2 = append_to_store(store, d2, mode="stream", target_rows=400)
    assert f2["n_rows"] == pq.read_metadata(src).num_rows

    from howard_ray.ops.util import to_table
    dec = to_table(decode_store(store))
    srct = pq.read_table(src)
    dec = dec.select(srct.column_names).take(pc.sort_indices(dec["doc_id"]))
    assert dec.equals(srct.take(pc.sort_indices(srct["doc_id"])))

    # delete + vacuum + compact, all through the layer
    delete_where(store, ("source", "==", "web"))
    dec2 = to_table(decode_store(store))
    assert "web" not in set(dec2["source"].to_pylist())
    compact_store(store, target_rows=1000)
    vacuum_store(store)
    assert store_total_bytes(store) > 0
    assert load_footer(store)["n_rows"] == dec2.num_rows

    # no literal 'shim:' directory appeared anywhere near the CWD
    assert not os.path.exists("shim:")
    assert set(os.listdir(".")) == cwd_entries


def test_mem_makedirs_registers_ancestors(ray_session):
    from howard_ray import storeio as sio
    base = "mem://anc/a/b/c"
    sio.makedirs(base)
    for p in ("mem://anc/a/b/c", "mem://anc/a/b", "mem://anc/a"):
        assert sio.isdir(p), p
        sio.listdir(p)  # must not raise


def test_shim_rest_cannot_escape_root():
    import os
    from howard_ray import storeio as sio
    root = os.environ.get("HOWARD_SHIM_ROOT", "/tmp/howard_shim")
    for evil in ("shim:////etc/passwd", "shim://../../etc/passwd",
                 "shim://a/../../../etc/passwd"):
        p = sio.local_path(evil)
        assert os.path.commonpath([os.path.abspath(p), root]) == root, p


def test_pfs_publish_uses_atomic_put_whole(tmp_path, monkeypatch):
    """The no-rename publish must go through the handler's atomic PUT
    primitive, never a truncating open('wb') on the final key."""
    from howard_ray import storeio as sio
    h = sio._HANDLERS["pfs"]
    calls = []
    orig = type(h).put_whole

    def spy(self, rest, data):
        calls.append(rest)
        return orig(self, rest, data)

    monkeypatch.setattr(type(h), "put_whole", spy)
    base = f"pfs://{tmp_path}"
    sio.makedirs(base)
    with sio.sopen(sio.join(base, "f.tmp"), "wb") as f:
        f.write(b"v2")
    sio.replace(sio.join(base, "f.tmp"), sio.join(base, "f.json"))
    assert calls and calls[0].endswith("f.json")
    with sio.sopen(sio.join(base, "f.json"), "rb") as f:
        assert f.read() == b"v2"
    # no temp residue
    import os
    assert [x for x in os.listdir(tmp_path) if "__put" in x] == []
