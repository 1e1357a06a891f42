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


# ---- distributed BPE merge rounds (iterative algorithm on tokens) ----

BPE_ROUNDS = 4
BPE_BASE = 1 << 20          # merged-symbol ids start above any vocab id
_PACK = 21                  # ids < 2^21 after BPE_ROUNDS rounds -> exact pack


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc
    vals = pc.list_flatten(batch["tokens"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(batch["tokens"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return vals, lens


def _greedy_merge(vals: np.ndarray, lens: np.ndarray,
                  merges: list[tuple[int, int, int]]
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Apply merge rules in order with exact left-to-right greedy
    semantics, fully vectorized. Overlapping candidates only chain when
    a == b (runs of one symbol); greedy there = every other position from
    each run start, computed from consecutive-index groups."""
    for a, b, new in merges:
        if vals.size < 2:
            continue
        ends = np.cumsum(lens) - 1              # last index of each row
        cand = (vals[:-1] == a) & (vals[1:] == b)
        cand[ends[ends < cand.size]] = False    # no cross-row pairs
        idx = np.flatnonzero(cand)
        if idx.size == 0:
            continue
        grp_start = np.concatenate(([True], np.diff(idx) != 1))
        offset = np.arange(idx.size) - np.maximum.accumulate(
            np.where(grp_start, np.arange(idx.size), -1))
        keep = idx[offset % 2 == 0]
        vals = vals.copy()
        vals[keep] = new
        row_of = np.searchsorted(np.cumsum(lens) - 1, keep + 1, "left")
        vals = np.delete(vals, keep + 1)
        lens = lens - np.bincount(row_of, minlength=lens.size)
    return vals, lens


def bpe_merges(sf_dir: str, rounds: int = BPE_ROUNDS):
    """Distributed BPE training rounds over the north-star tokens corpus:
    each round applies the merges learned so far (broadcast rule list,
    exact vectorized greedy inside ``map_batches``), counts adjacent-pair
    frequencies as per-batch partials, reduces with one grouped sum +
    per-block top-1 prune, and the driver picks the argmax pair
    (count DESC, pair ASC tie-break) as the round's new symbol — the
    k-means-style iterative-algorithm shape (broadcast state, combiner
    partials) applied to the tokens table. Iterative resegmentation is not
    SQL-expressible → rows-only; pytest recomputes the rounds with an
    independent scalar reference."""
    path = ensure_tokens_fixture()
    ds = ray.data.read_parquet(path, columns=["tokens"])
    merges: list[tuple[int, int, int]] = []
    rows = []
    for r in range(rounds):
        m_ref = ray.put(list(merges))

        def pair_partials(batch: pa.Table) -> pa.Table:
            vals, lens = _flat_tokens(batch)
            vals, lens = _greedy_merge(vals, lens, ray.get(m_ref))
            if vals.size < 2:
                return pa.table({"pair": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            ends = np.cumsum(lens) - 1
            mask = np.ones(vals.size - 1, dtype=bool)
            mask[ends[ends < mask.size]] = False
            key = (vals[:-1] << _PACK) | vals[1:]
            u, c = np.unique(key[mask], return_counts=True)
            return pa.table({"pair": pa.array(u),
                             "cnt": pa.array(c.astype(np.int64))})

        def add_bucket(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.append_column(
                "b", pc.cast(pc.bit_wise_and(batch["pair"],
                                             pa.scalar(255, pa.int64())),
                             pa.int32()))

        def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
            # bounded-groupby rule (DESIGN.md §8.1): the distinct-pair key
            # space scales with vocab^2, so the per-pair sum runs as a
            # vectorized pandas groupby inside 256 hash buckets; argmax of
            # a total order distributes over the bucket partition
            t = g.groupby("pair", as_index=False)["cnt"].sum()
            t = t.sort_values(["cnt", "pair"], ascending=[False, True])
            return t.head(1)

        best = (ds.map_batches(pair_partials, batch_format="pyarrow")
                  .map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("b").map_groups(bucket_top, batch_format="pandas")
                  .to_pandas()
                  .sort_values(["cnt", "pair"], ascending=[False, True]))
        if best.empty:
            break
        pair = int(best.iloc[0]["pair"])
        cnt = int(best.iloc[0]["cnt"])
        a, b = pair >> _PACK, pair & ((1 << _PACK) - 1)
        new = BPE_BASE + r
        merges.append((a, b, new))
        rows.append({"round": r, "tok_a": a, "tok_b": b,
                     "new_id": new, "cnt": cnt})
    return pd.DataFrame(rows)


def bpe_apply(sf_dir: str, rounds: int = BPE_ROUNDS):
    """Apply the learned BPE merge table corpus-wide and report per-source
    token counts before/after — the vocabulary-extension payoff check
    (tokens_after/tokens_before < 1). One training call (itself
    distributed) + one stateless apply pass with the merge rules
    broadcast; rows-only + pytest consistency with bpe_merges counts."""
    from ray.data.aggregate import Sum

    trained = bpe_merges(sf_dir, rounds=rounds)
    merges = [(int(r["tok_a"]), int(r["tok_b"]), int(r["new_id"]))
              for _, r in trained.iterrows()]
    m_ref = ray.put(merges)
    path = ensure_tokens_fixture()
    ds = ray.data.read_parquet(path, columns=["tokens", "source"])

    def apply_count(batch: pa.Table) -> pa.Table:
        vals, lens = _flat_tokens(batch)
        _, lens2 = _greedy_merge(vals, lens, ray.get(m_ref))
        t = pa.table({"source": batch["source"],
                      "before": pa.array(lens),
                      "after": pa.array(lens2)})
        g = t.group_by("source").aggregate(
            [("before", "sum"), ("after", "sum")])
        return pa.table({"source": g["source"],
                         "tok_before": g["before_sum"],
                         "tok_after": g["after_sum"]})

    out = (ds.map_batches(apply_count, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("tok_before", alias_name="tok_before"),
                        Sum("tok_after", alias_name="tok_after"))
             .to_pandas())
    out["tok_before"] = out["tok_before"].astype("int64")
    out["tok_after"] = out["tok_after"].astype("int64")
    out["ratio"] = (out["tok_after"] / out["tok_before"]).round(4)
    return out.sort_values("source").reset_index(drop=True)


# ---- sequence packing (concat-and-chunk training-example assembly) ----

PACK_L = 4096  # training-example context length (tokens)


def pack_sequences(sf_dir: str):
    """GPT-style sequence packing report: per source, documents are
    concatenated in doc_id order and chunked into fixed ``PACK_L``-token
    training examples (documents straddling a boundary are split — the
    standard concat-and-chunk packing). Emits per source: the example
    count, the fill ratio (only the final example carries padding), and
    how many documents get split across an example boundary.

    Scale shape: the running_total discipline — sources bucketed by hash
    (bounded key space), one vectorized doc_id-ordered cumulative sum per
    source inside ``map_groups``; the token arrays themselves never load
    (n_tok only) and never shuffle. The oracle computes the same prefix
    sums with a window function over the same materialized fixture."""
    path = ensure_tokens_fixture()
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "n_tok"])

    def add_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g["b"] = pd.util.hash_array(
            g["source"].to_numpy(dtype=object), categorize=False) \
            % np.uint64(32)
        g["b"] = g["b"].astype("int64")
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s, sub in g.groupby("source"):
            sub = sub.sort_values("doc_id")
            cend = sub["n_tok"].to_numpy(dtype=np.int64).cumsum()
            cstart = cend - sub["n_tok"].to_numpy(dtype=np.int64)
            total = int(cend[-1]) if len(cend) else 0
            n_ex = -(-total // PACK_L) if total else 0
            rows.append({
                "source": s,
                "n_examples": n_ex,
                "fill_ratio": round(total / (n_ex * PACK_L), 4)
                if n_ex else 0.0,
                "n_split_docs": int((cstart // PACK_L
                                     != (cend - 1) // PACK_L).sum()),
            })
        return pd.DataFrame(rows)

    out = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    for c in ("n_examples", "n_split_docs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def _pack_twin_sql() -> str:
    path = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        f"tokens_q_{_Q_ROWS}.parquet")
    return f"""
WITH w AS (
  SELECT source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cend
  FROM read_parquet('{path}')),
d AS (SELECT source, n_tok, cend - n_tok AS cstart, cend FROM w)
SELECT source,
  CAST(CEIL(SUM(n_tok) / {PACK_L}.0) AS BIGINT) AS n_examples,
  ROUND(SUM(n_tok) / (CEIL(SUM(n_tok) / {PACK_L}.0) * {PACK_L}.0), 4)
    AS fill_ratio,
  CAST(SUM(CASE WHEN cstart // {PACK_L} != (cend - 1) // {PACK_L}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
FROM d GROUP BY source ORDER BY source
"""


SQL["pack_sequences"] = _pack_twin_sql()
