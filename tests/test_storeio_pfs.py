"""Persistent no-rename backend (round-5 verdict item #2): the built-in
``pfs://`` scheme is the local filesystem seen through the fsspec adapter
with ``supports_replace = False`` — every publish runs the object-store
copy-PUT + delete path (same shape ``mem://`` proves), but the store
PERSISTS: a child process encodes it, gets SIGKILLed mid-flight, a second
child resumes it, and the PARENT process decodes bit-identical. That is
the cross-process durability claim ``mem://`` (session lifetime) could
not make."""

import os
import signal
import subprocess
import sys
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray import storeio as sio
from howard_ray.fixtures import write_corpus, write_corpus_dir
from howard_ray.manifest import load_manifest
from howard_ray.ops.util import to_table
from howard_ray.pipeline import decode_store, encode_dataset

_CHILD = """
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from howard_ray.pipeline import encode_dataset
encode_dataset(sys.argv[1], sys.argv[2], mode="stream", target_rows=400)
"""


def test_pfs_publish_never_renames(tmp_path, monkeypatch):
    """The atomic publish on pfs:// must go through copy-PUT + delete,
    never the backend's rename."""
    h = sio._HANDLERS["pfs"]
    assert h.supports_replace is False

    def boom(*a, **k):
        raise AssertionError("rename used on a no-rename backend")

    monkeypatch.setattr(type(h), "replace", boom)
    base = f"pfs://{tmp_path}"
    sio.makedirs(base)
    with sio.sopen(sio.join(base, "x.tmp"), "wb") as f:
        f.write(b"payload")
    sio.replace(sio.join(base, "x.tmp"), sio.join(base, "x.bin"))
    assert not sio.exists(sio.join(base, "x.tmp"))
    with sio.sopen(sio.join(base, "x.bin"), "rb") as f:
        assert f.read() == b"payload"


def test_pfs_store_persists_across_processes(ray_session, tmp_path):
    """Encode in a child process through pfs://, decode in THIS process:
    the no-rename handler's store survives its writer."""
    src = write_corpus(str(tmp_path / "c.parquet"), 3000)
    store = f"pfs://{tmp_path}/store"
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-c", _CHILD, src, store],
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, timeout=300)
    dec = to_table(decode_store(store))
    srct = pq.read_table(src)
    dec = (dec.select(srct.column_names)
           .take(pc.sort_indices(dec["doc_id"])))
    srct = srct.take(pc.sort_indices(srct["doc_id"]))
    assert dec.cast(srct.schema).equals(srct)


N_ROWS = 300_000


def test_pfs_sigkill_resume_decode_in_parent(ray_session, tmp_path):
    """Full round-5 item #2 lifecycle: child encodes through the
    no-rename handler, SIGKILL mid-encode, a resume run (this process)
    finishes the store reusing every completed block, and the decode is
    bit-identical — all through pfs:// (no plain-path shortcut)."""
    src = write_corpus_dir(
        os.path.join("/tmp/howard_ray_cache", f"kill_corpus_n{N_ROWS}"),
        N_ROWS, shards=16, seed=31)
    local = str(tmp_path / "store")         # on-disk location
    store = f"pfs://{local}"                # handler-mediated URI
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    p = subprocess.Popen([sys.executable, "-c", _CHILD, src, store],
                         env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    bdir = os.path.join(local, "blocks")
    deadline = time.time() + 180
    while time.time() < deadline and p.poll() is None:
        done = ([f for f in os.listdir(bdir) if f.endswith(".hrb")]
                if os.path.isdir(bdir) else [])
        if len(done) >= 6:
            break
        time.sleep(0.1)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        killed = True
    else:
        killed = False

    pre_ids = {r["block_id"] for r in load_manifest(store)}
    if killed:
        assert p.returncode == -signal.SIGKILL
        assert not os.path.exists(os.path.join(local, "footer.json")), \
            "kill landed after completion; enlarge the corpus"
        assert pre_ids, "killed before any lineage record"

    f = encode_dataset(src, store, mode="stream", target_rows=400)
    assert f["n_rows"] == N_ROWS

    post = load_manifest(store)
    counts: dict = {}
    for r in post:
        counts[r["block_id"]] = counts.get(r["block_id"], 0) + 1
    for bid in pre_ids:
        assert counts.get(bid) == 1, f"block {bid} re-encoded"

    dec = to_table(decode_store(store))
    srct = pq.read_table(src)
    dec = (dec.select(srct.column_names)
           .take(pc.sort_indices(dec["doc_id"])))
    srct = srct.take(pc.sort_indices(srct["doc_id"]))
    assert dec.cast(srct.schema).equals(srct)
