"""CLI end-to-end smoke (subprocess owns its own Ray session) + edge cases."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import make_tokens_corpus


def test_cli_encode_stats_decode(tmp_path):
    src = str(tmp_path / "c.parquet")
    pq.write_table(make_tokens_corpus(800), src)
    store = str(tmp_path / "store")
    env = dict(os.environ)

    r = subprocess.run(
        [sys.executable, "-m", "howard_ray.cli", "--num-cpus", "4",
         "encode", src, store, "--mode", "stream", "--target-rows", "400"],
        capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_rows"] == 800

    r = subprocess.run(
        [sys.executable, "-m", "howard_ray.cli", "--num-cpus", "4",
         "stats", store],
        capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout)
    assert rep["n_rows"] == 800
    assert rep["compression_ratio"] > 1


def test_encode_empty_input(ray_session, tmp_path):
    import pyarrow as pa

    from howard_ray.pipeline import encode_dataset

    empty = make_tokens_corpus(10).slice(0, 0)
    src = str(tmp_path / "empty.parquet")
    pq.write_table(empty, src)
    store = str(tmp_path / "store")
    footer = encode_dataset(src, store, mode="stream", target_rows=100)
    assert footer["n_rows"] == 0
    assert footer["n_blocks"] == 0
