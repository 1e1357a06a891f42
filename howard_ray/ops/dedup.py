"""Deduplication operators over ``documents``: exact (content-hash
partition + per-group first), MinHash+LSH near-dup, SimHash, n-gram Jaccard
verification.

The reference has no global dedup (variant keys are assumed unique,
SURVEY.md §2.12 — closest is list_distinct / uniquify,
howard/objects/variants.py:7405-7408); these are the training-data-pipeline
extensions the engine provides as first-class operators. All hashes are
deterministic across processes (fixed-key SipHash via pandas hash_array /
explicit polynomial hashes), so results are reproducible and resumable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..pipeline import stable_hash_u64
from .util import tbl

SQL: dict[str, str] = {}

NUM_PERM = 64          # minhash permutations
LSH_BANDS = 16         # 16 bands x 4 rows
JACCARD_THRESHOLD = 0.6


def dedup_exact(sf_dir: str):
    """Exact dedup: vectorized content hash per batch → hash-partitioned
    groupby → keep min doc_id per group (the guide's canonical exact-dedup
    shape). Output: survivor doc_id + duplicate count."""
    ds = tbl(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_hash_u64(batch["text"])
        return pa.table({"doc_id": batch["doc_id"],
                         "text": batch["text"],
                         "h": pa.array(h.view(np.int64))})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # guard against 64-bit hash collisions: group further by exact text
        out = g.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        return out[["doc_id", "n_dups"]]

    out = (ds.map_batches(add_hash, batch_format="pyarrow")
             .groupby("h").map_groups(keep_first, batch_format="pandas")
             .to_pandas())
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


SQL["dedup_exact"] = """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY text ORDER BY doc_id
"""


def _shingles(words: list[str], k: int = 3) -> list[str]:
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """Per-batch MinHash signatures over word 3-shingles.

    NUM_PERM permutations simulated with the standard (a*h+b) mod p family
    over a base 64-bit shingle hash; a/b are fixed by seed=42 so signatures
    are deterministic everywhere (mergeable-sketch discipline)."""

    P = (1 << 61) - 1  # Mersenne prime

    def __init__(self):
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, self.P, NUM_PERM, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, self.P, NUM_PERM, dtype=np.int64).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text.split(" "))
        if not sh:
            return np.zeros(NUM_PERM, dtype=np.uint64)
        base = stable_hash_u64(np.array(sh, dtype=object)) % self.P
        # (NUM_PERM, n_shingles) permuted hashes -> row-wise min
        with np.errstate(over="ignore"):
            perm = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.P
        return perm.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"].to_numpy()])
        # emit one row per (band, band_hash, doc): LSH banding
        r = NUM_PERM // LSH_BANDS
        rows = {"doc_id": np.repeat(batch["doc_id"].to_numpy(), LSH_BANDS),
                "band": np.tile(np.arange(LSH_BANDS, dtype=np.int32), len(batch))}
        band_vals = sigs.reshape(len(batch), LSH_BANDS, r)
        # deterministic band hash: polynomial combine of the r values
        with np.errstate(over="ignore"):
            bh = np.zeros((len(batch), LSH_BANDS), dtype=np.uint64)
            for i in range(r):
                bh = bh * np.uint64(1099511628211) + band_vals[:, :, i]
        rows["band_hash"] = bh.reshape(-1).view(np.int64)
        return pd.DataFrame(rows)


def dedup_minhash_candidates(sf_dir: str):
    """MinHash+LSH candidate duplicate pairs: shingle→minhash→band→bucket
    groupby→pairs (rows-only oracle: not SQL-expressible)."""
    ds = tbl(sf_dir, "documents", ["doc_id", "text"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(set(g["doc_id"]))
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        a, b = zip(*[(docs[i], docs[j]) for i in range(len(docs))
                     for j in range(i + 1, len(docs))])
        return pd.DataFrame({"doc_a": np.array(a, dtype=np.int64),
                             "doc_b": np.array(b, dtype=np.int64)})

    cand = (ds.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 4))
              .groupby(["band", "band_hash"])
              .map_groups(pairs, batch_format="pandas")
              .to_pandas())
    cand = cand.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return cand


def dedup_ngram_verified(sf_dir: str):
    """Near-dup pairs: LSH candidates verified with exact n-gram Jaccard
    similarity >= threshold (broadcast text lookup — candidate set is small
    relative to the corpus by construction). Rows-only oracle."""
    import ray
    cand = dedup_minhash_candidates(sf_dir)
    docs = tbl(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    text_ref = ray.put(dict(zip(docs["doc_id"], docs["text"])))
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    texts = ray.get(text_ref)

    def jac(a: int, b: int) -> float:
        sa = set(_shingles(texts[a].split(" ")))
        sb = set(_shingles(texts[b].split(" ")))
        if not sa or not sb:
            return 0.0
        return len(sa & sb) / len(sa | sb)

    cand["jaccard"] = [round(jac(a, b), 4)
                       for a, b in zip(cand["doc_a"], cand["doc_b"])]
    out = cand[cand["jaccard"] >= JACCARD_THRESHOLD]
    return out.reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over word features (deterministic fixed-key word
    hashes); near-dup = small Hamming distance. Rows-only oracle."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_numpy()):
            words = text.split(" ")
            if not words:
                out[i] = 0
                continue
            h = stable_hash_u64(np.array(words, dtype=object))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    ).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0).astype(np.uint8),
                                 bitorder="little").view(np.uint64)[0]
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": out.view(np.int64)})


def simhash_fingerprints(sf_dir: str):
    out = (tbl(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51);
# 0.42 yields a non-trivial verified pair set at sf0.01
EMBED_DUP_THRESHOLD = 0.42


def dedup_embedding(sf_dir: str):
    """Embedding-cosine near-duplicate pairs: per-batch matmul against the
    broadcast (normalized) full matrix, emit pairs with cosine >= threshold
    (a < b dedup of the symmetric pair). The scale path replaces the
    broadcast with LSH/IVF bucket co-partitioning (ann_lsh_buckets /
    ann_ivf_topk) so each batch only scores its own buckets."""
    import ray as _ray

    from .util import tbl

    emb = tbl(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    ref = _ray.put((ids, m))

    class Pairs:
        def __init__(self):
            self.ids, self.m = _ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            bm /= np.linalg.norm(bm, axis=1, keepdims=True)
            sims = bm @ self.m.T
            bi = batch["vec_id"].to_numpy()
            rows_a, rows_b, rows_s = [], [], []
            hits = np.argwhere(sims >= EMBED_DUP_THRESHOLD)
            for r, c in hits:
                a, b = int(bi[r]), int(self.ids[c])
                if a < b:
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_s.append(round(float(sims[r, c]), 4))
            return pd.DataFrame({
                "vec_a": pd.Series(rows_a, dtype="int64"),
                "vec_b": pd.Series(rows_b, dtype="int64"),
                "cosine": pd.Series(rows_s, dtype="float64"),
            })

    out = (tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
           .map_batches(Pairs, batch_format="pandas", concurrency=(1, 4))
           .to_pandas())
    if out.empty:
        out = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                            "vec_b": pd.Series([], dtype="int64"),
                            "cosine": pd.Series([], dtype="float64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


SQL["dedup_embedding"] = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {EMBED_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""
