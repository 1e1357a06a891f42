"""Metadata-scale evidence (round-3 verdict item #8): a store whose
FOOTER holds hundreds of thousands of block records — the 100-TB shape
(100 TB / ~250 MB encoded blocks ≈ 4·10^5 blocks) — exercised through
the real driver-side planning paths:

  1. write_footer of N records (sharded: HOWARD_FOOTER_SHARD_SIZE);
  2. load_footer (all shards) + driver RSS delta;
  3. zone-pruned decode: an equality predicate whose implied range
     excludes every synthetic block from the FOOTER ALONE — wall time
     tracks MATCHING blocks, not store size;
  4. store ORDER BY/LIMIT top-k scan (sqlmini greedy block scan);
  5. resume diff (completed_blocks) at the same scale.

The synthetic records are real footer records in every field the
planners consult (sort_key, n_rows, columns min/max zone maps); only
their block FILES are absent — valid here because the measured paths
prune them before any file open, and opening one would error loudly.

Usage: python tools/metadata_scale_bench.py [n_fake_blocks]
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    n_fake = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from howard_ray.fixtures import write_corpus
    from howard_ray.manifest import (completed_blocks, load_footer,
                                     load_manifest, write_footer)
    from howard_ray.pipeline import decode_store, encode_dataset
    from howard_ray.sqlmini import run_sql

    root = "/tmp/howard_meta_scale"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "corpus.parquet")
    store = os.path.join(root, "store")
    write_corpus(src, 8000)
    encode_dataset(src, store, mode="cluster", target_rows=1000)
    footer = load_footer(store)
    real = footer["blocks"]
    n_real_rows = footer["n_rows"]

    # synthetic records: disjoint zone maps lexically AFTER every real
    # source, one source value per block so equality probes prune all
    fake = []
    for i in range(n_fake):
        s = f"zfake{i:07d}"
        fake.append({
            "block_id": f"zfake-{i:07d}", "sort_key": f"{s}/00000",
            "n_rows": 1000, "raw_bytes": 1 << 20,
            "encoded_bytes": 1 << 18, "crc32": 0,
            "input": f"cluster:{s}:0", "profile": "standard",
            "encode_sec": 0.0,
            "codecs": {"source": "dict_str"},
            "columns": {
                "source": {"stats": {"min": s, "max": s}},
                "doc_id": {"stats": {"min": f"{s}/doc-0",
                                     "max": f"{s}/doc-9"}},
                "n_tok": {"stats": {"min": 10, "max": 5000,
                                    "sum": 1000, "n_values": 1000}},
            },
        })

    out: dict = {"n_fake_blocks": n_fake, "n_real_blocks": len(real)}
    t0 = time.perf_counter()
    write_footer(store, real + fake, extra=footer.get("extra"))
    out["write_footer_sec"] = round(time.perf_counter() - t0, 3)
    shard_dir = os.path.join(store, "footer_shards")
    out["footer_shards"] = (len(os.listdir(shard_dir))
                            if os.path.isdir(shard_dir) else 0)

    r0 = rss_mb()
    t0 = time.perf_counter()
    f2 = load_footer(store)
    out["load_footer_sec"] = round(time.perf_counter() - t0, 3)
    out["load_footer_rss_mb"] = round(rss_mb() - r0, 1)
    assert f2["n_blocks"] == len(real) + n_fake

    # zone-pruned decode: 'books' excludes every synthetic block from the
    # footer zone maps alone; only the real matching blocks are read
    t0 = time.perf_counter()
    n = decode_store(store, columns=["doc_id", "n_tok"],
                     predicate=("source", "==", "books")).count()
    out["zone_pruned_decode_sec"] = round(time.perf_counter() - t0, 3)
    out["zone_pruned_rows"] = int(n)
    assert 0 < n < n_real_rows

    # store ORDER BY/LIMIT greedy block scan (sort_key ascending: real
    # blocks sort first, the scan stops after enough rows)
    t0 = time.perf_counter()
    top = run_sql(store, "SELECT doc_id, n_tok FROM store "
                         "ORDER BY doc_id LIMIT 25")
    out["store_topk_sec"] = round(time.perf_counter() - t0, 3)
    assert len(top) == 25

    # resume diff at metadata scale (manifest holds only real lineage)
    t0 = time.perf_counter()
    done = completed_blocks(store)
    out["completed_blocks_sec"] = round(time.perf_counter() - t0, 3)
    out["manifest_records"] = len(load_manifest(store))
    assert len(done) >= len(real)

    out["driver_peak_rss_mb"] = round(rss_mb(), 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
