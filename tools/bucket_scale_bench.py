"""Round-5 evidence: derived bucket counts keep per-task fold input
bounded as the corpus grows (verdict item #1).

Builds 1x and 5x corpora from sf0.1 documents (doc_id offsets + per-replica
text salt so cross-replica texts are NOT near-dups and the pair count stays
O(replicas), not O(replicas^2)), then runs dedup_minhash_candidates and
dedup_components on both with a small HOWARD_TASK_BYTES so the bytes-driven
sizing (not the parallelism floor) decides the bucket counts — exactly the
regime a 100-TB corpus is in. Reports, per scale: derived bucket counts,
wall times, and the MAX PER-BUCKET ROW COUNT of the dominant shuffles
(computed with the ops' own hash functions), which must stay ~flat while
n_buckets grows with the corpus.

Usage: HOWARD_TASK_BYTES=65536 python tools/bucket_scale_bench.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/howard_bucket_scale"


def build_corpus(replicas: int) -> str:
    out_dir = os.path.join(WORK, f"x{replicas}")
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = t.num_rows
    parts = []
    for r in range(replicas):
        ids = pa.array(np.asarray(t["doc_id"]) + r * 10_000_000)
        if r == 0:
            texts = t["text"]
        else:
            # salt EVERY word with a replica suffix so every 3-gram
            # shingle differs and cross-replica Jaccard is exactly 0 —
            # the near-dup structure is then replicated, not squared
            texts = pa.array([" ".join(w + f"r{r}" for w in s.split(" "))
                              for s in t["text"].to_pylist()])
        parts.append(pa.table({
            "doc_id": ids, "text": texts, "source": t["source"],
            "lang": t["lang"], "n_chars": t["n_chars"]}))
    pq.write_table(pa.concat_tables(parts), path)
    return out_dir


def bucket_histogram(sf_dir: str) -> dict:
    """Max/mean per-bucket row counts for the two dominant derived-bucket
    shuffles, using the ops' own hash + derivation functions."""
    from howard_ray.ops.dedup import LSH_BANDS
    from howard_ray.ops.util import (buckets_for_table, derive_buckets,
                                     parquet_rows)
    from howard_ray.pipeline import stable_hash_u64

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    out = {}
    # dedup_exact: text-hash buckets carrying full texts
    nb = buckets_for_table(sf_dir, "documents", ["doc_id", "text"])
    h = stable_hash_u64(t["text"]) % nb
    cnt = np.bincount(h.view(np.int64), minlength=nb)
    out["exact"] = {"n_buckets": int(nb), "max_rows": int(cnt.max()),
                    "mean_rows": float(cnt.mean())}
    # components/survivors: doc_id % nb
    nb2 = derive_buckets(parquet_rows(sf_dir, "documents") * 48)
    c2 = np.bincount(np.asarray(t["doc_id"]) % nb2, minlength=nb2)
    out["components"] = {"n_buckets": int(nb2), "max_rows": int(c2.max()),
                         "mean_rows": float(c2.mean())}
    # minhash band-bucket count (band rows ~ docs x bands)
    out["minhash_n_buckets"] = int(derive_buckets(
        parquet_rows(sf_dir, "documents") * LSH_BANDS * 24))
    return out


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from howard_ray.ops.components import dedup_components
    from howard_ray.ops.dedup import dedup_minhash_candidates

    shutil.rmtree(WORK, ignore_errors=True)
    res = {"task_bytes": int(os.environ.get("HOWARD_TASK_BYTES",
                                            64 << 20))}
    for reps in (1, 5):
        d = build_corpus(reps)
        row = bucket_histogram(d)
        t0 = time.perf_counter()
        cand = dedup_minhash_candidates(d)
        row["minhash_sec"] = round(time.perf_counter() - t0, 2)
        row["minhash_pairs"] = int(len(cand))
        t0 = time.perf_counter()
        comp = dedup_components(d)
        row["components_sec"] = round(time.perf_counter() - t0, 2)
        row["components_rows"] = int(len(comp))
        res[f"x{reps}"] = row
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
