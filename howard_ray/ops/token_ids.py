"""Token-id analytics over the north-star corpus table itself
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string) — the
payload axis of the graft: frequency ranking and per-source distribution
entropy computed directly on the int32 token arrays.

Scale shape: each batch emits a FIXED-SIZE mergeable summary — a
vocab-length (50257) int64 bincount, ~400 KiB regardless of batch row
count — and the merge is an elementwise sum of n_batches arrays (the same
mergeable-summary class as the HyperLogLog registers in ops/sampling.py).
The token stream itself never shuffles; a groupby over 10^12x~300 token
rows would move the entire corpus. When the vocabulary is unbounded
(raw text, not BPE ids) the bincount becomes (token, cnt) partials + a
keyed groupby instead.

Both queries run over a deterministic materialized corpus (seed=42, the
FIXTURES.md F1 generator), so the DuckDB twin reads the same parquet file
and the comparison is exact.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..fixtures import VOCAB, write_corpus

SQL: dict[str, str] = {}

_Q_ROWS = 20_000
TOPK = 20


def ensure_tokens_fixture() -> str:
    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"tokens_q_{_Q_ROWS}.parquet")
    if not os.path.exists(path):
        write_corpus(path + ".tmp", _Q_ROWS)
        os.replace(path + ".tmp", path)
    return path


def _bincount_batch(batch: pa.Table, by_source: bool) -> pa.Table:
    """Per-batch token-id bincount(s) as binary rows (mergeable by sum)."""
    import pyarrow.compute as pc

    flat_all = pc.list_flatten(batch["tokens"]).to_numpy(zero_copy_only=False)
    if not by_source:
        counts = np.bincount(flat_all, minlength=VOCAB).astype(np.int64)
        return pa.table({"source": pa.array(["*"]),
                         "regs": pa.array([counts.tobytes()], pa.binary())})
    lens = pc.list_value_length(batch["tokens"]).to_numpy(zero_copy_only=False)
    srcs = batch["source"].to_numpy(zero_copy_only=False)
    per_tok_src = np.repeat(srcs, lens)
    names, rows = [], []
    for s in np.unique(srcs):
        counts = np.bincount(flat_all[per_tok_src == s],
                             minlength=VOCAB).astype(np.int64)
        names.append(str(s))
        rows.append(counts.tobytes())
    # explicit types so an empty batch yields the same schema as full ones
    return pa.table({"source": pa.array(names, pa.string()),
                     "regs": pa.array(rows, pa.binary())})


def _merged_counts(by_source: bool) -> dict[str, np.ndarray]:
    path = ensure_tokens_fixture()
    ds = ray.data.read_parquet(path, columns=["tokens", "source"])
    parts = ds.map_batches(lambda b: _bincount_batch(b, by_source),
                           batch_format="pyarrow").to_pandas()
    out: dict[str, np.ndarray] = {}
    for s, regs in zip(parts["source"], parts["regs"]):
        arr = np.frombuffer(regs, dtype=np.int64)
        out[s] = out[s] + arr if s in out else arr.copy()
    return out


def token_freq_topk(sf_dir: str):
    """Global top-K token ids by count (count DESC, token ASC tie-break)."""
    counts = _merged_counts(by_source=False)["*"]
    order = np.lexsort((np.arange(VOCAB), -counts))[:TOPK]
    return pd.DataFrame({"token": order.astype("int64"),
                         "cnt": counts[order].astype("int64")})


def token_entropy_by_source(sf_dir: str):
    """Per-source Shannon entropy (nats) of the token-id distribution +
    total token count — the distribution-shift signal that justifies the
    engine's per-source clustering (narrower per-source distributions ==
    better dictionaries)."""
    rows = []
    for s, counts in sorted(_merged_counts(by_source=True).items()):
        n = int(counts.sum())
        p = counts[counts > 0] / n
        rows.append({"source": s, "n_tokens": n,
                     "entropy": round(float(-(p * np.log(p)).sum()), 4)})
    return pd.DataFrame(rows)


def _twin_sql() -> tuple[str, str]:
    path = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        f"tokens_q_{_Q_ROWS}.parquet")
    topk = f"""
WITH t AS (SELECT unnest(tokens) AS tok FROM read_parquet('{path}'))
SELECT CAST(tok AS BIGINT) AS token, count(*) AS cnt
FROM t GROUP BY tok ORDER BY cnt DESC, tok LIMIT {TOPK}
"""
    entropy = f"""
WITH t AS (SELECT source, unnest(tokens) AS tok FROM read_parquet('{path}')),
c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
n AS (SELECT source, sum(c) AS n FROM c GROUP BY source)
SELECT c.source, CAST(any_value(n.n) AS BIGINT) AS n_tokens,
       round(-sum((c.c / n.n) * ln(c.c / n.n)), 4) AS entropy
FROM c JOIN n USING (source) GROUP BY c.source ORDER BY c.source
"""
    return topk, entropy


SQL["token_freq_topk"], SQL["token_entropy_by_source"] = _twin_sql()
