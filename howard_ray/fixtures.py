"""Deterministic synthetic `tokens_corpus` generator (FIXTURES.md F1).

Schema fixed by BASELINE.json ``input_hint``:
    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

seed=42 throughout; the same (seed, n_rows, variant) always produces the same
bytes, so tests, bench and both scaling runs share identical input.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "news", "forum", "papers", "legal"]
SOURCE_P = [0.55, 0.20, 0.10, 0.06, 0.04, 0.03, 0.015, 0.005]
# per-source effective vocabulary (different domains use different slices of
# the tokenizer): token = zipf_draw % cap. This is what makes the salted
# groupby('source') clustering pay: single-source blocks have narrower value
# ranges and tighter distributions than scan-order blocks.
SOURCE_VOCAB = {"web": VOCAB, "books": 32_000, "code": 8_192, "wiki": 40_000,
                "news": 20_000, "forum": 16_384, "papers": 45_000,
                "legal": 12_000}


_ZIPF_CDF = None


def _zipf_tokens(rng: np.random.Generator, n: int) -> np.ndarray:
    """Zipf(1.2)-distributed token ids over [0, VOCAB) via bounded inverse
    CDF (deterministic and ~100x faster than rejection-sampled rng.zipf)."""
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        p = 1.0 / np.power(np.arange(1, VOCAB + 1, dtype=np.float64), 1.2)
        _ZIPF_CDF = np.cumsum(p / p.sum())
    u = rng.random(n)
    return np.searchsorted(_ZIPF_CDF, u, side="left").astype(np.int32)


# int32 list-offset capacity; module-level so tests can exercise the
# chunked construction without generating 2^31 tokens
_OFFSET_LIMIT = 2**31


def make_tokens_corpus(n_rows: int, seed: int = 42, variant: str = "base") -> pa.Table:
    """Build the corpus table.

    variant: "base" | "sorted_by_source" | "shuffled" | "edge".
    5% of rows get constant-run segments (RLE-favorable), per FIXTURES.md.
    """
    rng = np.random.default_rng(seed)
    if variant == "edge":
        return _edge_table()
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)
    n_tok = np.clip(rng.lognormal(5.5, 0.8, n_rows), 16, 4096).astype(np.int32)
    total = int(n_tok.sum())
    values = _zipf_tokens(rng, total)
    offsets = np.concatenate(([0], np.cumsum(n_tok))).astype(np.int64)

    # fold each row's tokens into its source's effective vocabulary
    caps = np.array([SOURCE_VOCAB[SOURCES[i]] for i in src_idx], dtype=np.int64)
    per_value_cap = np.repeat(caps, n_tok)
    np.mod(values, per_value_cap.astype(np.int32), out=values)

    # 5% of rows: overwrite a middle segment with a constant run
    run_rows = rng.choice(n_rows, size=max(1, n_rows // 20), replace=False)
    for r in run_rows:
        lo, hi = int(offsets[r]), int(offsets[r + 1])
        ln = hi - lo
        if ln < 8:
            continue
        run_len = ln // 2
        run_tok = np.int32(rng.integers(0, VOCAB))
        start = lo + ln // 4
        values[start:start + run_len] = run_tok

    source = np.array(SOURCES, dtype=object)[src_idx]
    doc_id = np.array([f"{s}/doc-{i:012d}" for i, s in enumerate(source)], dtype=object)

    order = np.arange(n_rows)
    if variant == "sorted_by_source":
        order = np.argsort(src_idx, kind="stable")
    elif variant == "shuffled":
        order = rng.permutation(n_rows)

    # list<int32> offsets are 32-bit: past 2^31 total token values
    # (~8.6M rows at this length distribution) build the column in row
    # chunks whose per-chunk value counts fit, and concat — identical
    # logical content, chunked physical layout
    def _chunk_table(lo_row: int, hi_row: int) -> pa.Table:
        off = (offsets[lo_row:hi_row + 1] - offsets[lo_row]).astype(np.int32)
        vals = values[offsets[lo_row]:offsets[hi_row]]
        tok = pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                       pa.array(vals, type=pa.int32()))
        return pa.table({
            "doc_id": pa.array(doc_id[lo_row:hi_row], type=pa.string()),
            "tokens": tok,
            "n_tok": pa.array(n_tok[lo_row:hi_row], type=pa.int32()),
            "source": pa.array(source[lo_row:hi_row], type=pa.string()),
        })

    if total < _OFFSET_LIMIT:
        t = _chunk_table(0, n_rows)
    else:
        lim = _OFFSET_LIMIT - max(1, _OFFSET_LIMIT >> 9)
        bounds = [0]
        while bounds[-1] < n_rows:
            nxt = int(np.searchsorted(offsets, offsets[bounds[-1]] + lim,
                                      "left"))
            bounds.append(min(max(nxt - 1, bounds[-1] + 1), n_rows))
        t = pa.concat_tables(_chunk_table(a, b)
                             for a, b in zip(bounds[:-1], bounds[1:]))
    return t.take(pa.array(order)) if variant != "base" else t


def _edge_table() -> pa.Table:
    """Edge cases: empty list, singleton, max-length, vocab extremes, one
    block-straddling 100k+-token row (FIXTURES.md F1)."""
    rng = np.random.default_rng(42)
    rows = [
        ("web/doc-000000000000", np.array([], dtype=np.int32)),
        ("web/doc-000000000001", np.array([0], dtype=np.int32)),
        ("books/doc-000000000002", np.array([VOCAB - 1], dtype=np.int32)),
        ("code/doc-000000000003", _zipf_tokens(rng, 4096)),
        ("legal/doc-000000000004", _zipf_tokens(rng, 120_000)),
        ("papers/doc-000000000005", np.zeros(64, dtype=np.int32)),
    ]
    values = np.concatenate([r[1] for r in rows])
    offsets = np.concatenate(([0], np.cumsum([len(r[1]) for r in rows]))).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(values, type=pa.int32()))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "tokens": tokens,
        "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
        "source": pa.array([r[0].split("/")[0] for r in rows]),
    })


def write_corpus(path: str, n_rows: int, seed: int = 42, variant: str = "base",
                 row_group_size: int = 16_384) -> str:
    """Write the corpus parquet (skip if already present — deterministic)."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        t = make_tokens_corpus(n_rows, seed, variant)
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return path


def corpus_path(tmp_root: str, n_rows: int, seed: int = 42, variant: str = "base") -> str:
    """Canonical cached location for a generated corpus file."""
    return os.path.join(tmp_root, f"tokens_corpus_v2_{variant}_s{seed}_n{n_rows}.parquet")


def write_corpus_dir(dir_path: str, n_rows: int, shards: int = 32,
                     seed: int = 42, variant: str = "base",
                     row_group_size: int = 16_384) -> str:
    """Write the corpus as a directory of shard files (one file per shard,
    deterministic per shard) — the realistic 100-TB layout, and required for
    file-parallel reads (this Ray version issues one read task per file).
    Skips shards that already exist (resumable generation)."""
    os.makedirs(dir_path, exist_ok=True)
    done = dir_path.rstrip("/") + ".complete"  # outside the dir: readers must see only parquet
    if os.path.exists(done):
        return dir_path
    t = make_tokens_corpus(n_rows, seed, variant)
    per = -(-n_rows // shards)
    for i in range(shards):
        part = t.slice(i * per, per)
        if part.num_rows == 0:
            break
        p = os.path.join(dir_path, f"part-{i:04d}.parquet")
        if os.path.exists(p):
            continue
        pq.write_table(part, p + ".tmp", row_group_size=row_group_size)
        os.replace(p + ".tmp", p)
    with open(done, "w") as f:
        f.write(f"{n_rows}\n")
    return dir_path
