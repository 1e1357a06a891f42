"""Bench harness — the driver's per-round feedback loop.

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
at RAY_GRAFT_CPUS parallelism (default 32) and prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   ...engine throughput/ratio extras...}

--scaling: runs the headline encode pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same cached input and reports both
throughputs + scaling efficiency (the sandbox proxy for the north rule's
N-vs-4N-node cluster criterion), appending the result to BENCH/BASELINE.md.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = os.path.join(tempfile.gettempdir(), "howard_ray_bench")

# ~6M rows/sf-unit → sf0.1 = 600k rows, ~200M tokens, ~850 MB Arrow
ROWS_PER_SF = 6_000_000

OPS_IN_BENCH = ["pricing_summary", "join_hash", "dedup_exact",
                "window_hourly", "token_stats", "ann_cosine_topk"]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def prepare_corpus(sf: float) -> str:
    from howard_ray.fixtures import corpus_path, write_corpus
    os.makedirs(CACHE, exist_ok=True)
    n_rows = max(10_000, int(ROWS_PER_SF * sf))
    return write_corpus(corpus_path(CACHE, n_rows), n_rows)


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from howard_ray.pipeline import decode_store, encode_dataset, store_total_bytes

    sf = _sf_from_dir(SF_DIR)
    src = prepare_corpus(sf)
    pq.read_table(src)  # warm page cache (untimed)
    raw_bytes = pq.read_table(src).nbytes
    n_tokens = int(pq.read_table(src, columns=["n_tok"])["n_tok"].combine_chunks().sum().as_py() if True else 0)

    queries: dict[str, float] = {}
    extras: dict = {}

    # headline: flagship salted-shuffle encode pipeline
    store = os.path.join(CACHE, f"store_cluster_{NUM_CPUS}")
    if os.path.exists(store):
        shutil.rmtree(store)
    t0 = time.perf_counter()
    encode_dataset(src, store, mode="cluster", resume=False,
                   concurrency=NUM_CPUS)
    t_cluster = time.perf_counter() - t0
    queries["encode_cluster"] = round(t_cluster, 3)

    # stream-mode encode (no shuffle)
    store_s = os.path.join(CACHE, f"store_stream_{NUM_CPUS}")
    if os.path.exists(store_s):
        shutil.rmtree(store_s)
    t0 = time.perf_counter()
    encode_dataset(src, store_s, mode="stream", resume=False,
                   concurrency=NUM_CPUS)
    queries["encode_stream"] = round(time.perf_counter() - t0, 3)

    # decode pass (full scan of the encoded store)
    t0 = time.perf_counter()
    n_dec = decode_store(store).count()
    queries["decode"] = round(time.perf_counter() - t0, 3)
    assert n_dec > 0

    # parquet+zstd baseline write (single-threaded pyarrow, the reference's
    # store format) for ratio + throughput comparison
    t = pq.read_table(src)
    buf = io.BytesIO()
    t0 = time.perf_counter()
    pq.write_table(t, buf, compression="zstd")
    extras["parquet_zstd_write_sec"] = round(time.perf_counter() - t0, 3)
    extras["parquet_zstd_bytes"] = buf.getbuffer().nbytes
    del t, buf

    encoded_bytes = store_total_bytes(store)
    extras.update({
        "corpus_rows": pq.read_metadata(src).num_rows,
        "corpus_tokens": n_tokens,
        "raw_bytes": raw_bytes,
        "encoded_bytes": encoded_bytes,
        "compression_ratio_vs_raw": round(raw_bytes / encoded_bytes, 4),
        "beats_parquet_zstd": int(encoded_bytes <= extras["parquet_zstd_bytes"]),
        "encode_gbps": round(raw_bytes / t_cluster / 1e9, 4),
        "encode_tokens_per_sec": round(n_tokens / t_cluster, 1),
    })

    # representative operator pipelines over the sf tables
    from howard_ray.ops import all_queries
    q = all_queries()
    for name in OPS_IN_BENCH:
        t0 = time.perf_counter()
        res = q[name](SF_DIR)
        if hasattr(res, "count") and not hasattr(res, "empty"):
            res.count()
        queries[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "flagship encode pipeline wall time (salted groupby(source) "
                  "shuffle + per-block codec auto-select + ordered block write)",
        "value": queries["encode_cluster"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        **extras,
    }


def run_scaling() -> dict:
    lo_cpus, hi_cpus = 8, 32
    sf = _sf_from_dir(SF_DIR)
    prepare_corpus(sf)  # shared cached input for both child runs

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   HOWARD_BENCH_MINIMAL="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo = child(lo_cpus)
    hi = child(hi_cpus)
    t_lo = lo["queries"]["encode_cluster"]
    t_hi = hi["queries"]["encode_cluster"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    result = {
        "metric": "scaling efficiency, flagship encode, "
                  f"num_cpus {lo_cpus} vs {hi_cpus} (sandbox proxy for N vs 4N nodes)",
        "sf": sf,
        f"sec_{lo_cpus}": t_lo,
        f"sec_{hi_cpus}": t_hi,
        f"gbps_{lo_cpus}": lo.get("encode_gbps"),
        f"gbps_{hi_cpus}": hi.get("encode_gbps"),
        "scaling_efficiency": round(eff, 3),
    }
    _append_baseline_md(result)
    return result


def _append_baseline_md(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        with open(path, "a") as f:
            f.write(f"\n## Measured scaling run ({time.strftime('%Y-%m-%d %H:%M')})\n\n"
                    f"```json\n{json.dumps(result, indent=2)}\n```\n")
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        if os.environ.get("HOWARD_BENCH_MINIMAL"):
            OPS_IN_BENCH = []
        print(json.dumps(run_bench()))
        import ray
        ray.shutdown()
