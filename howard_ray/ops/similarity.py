"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k: the query matrix is broadcast once via ray.put and
every batch does one numpy matmul against it — no shuffle (the
broadcast-small-side join discipline). The LSH-bucketed variant is the scale
path: random-hyperplane bucket keys + per-bucket search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .util import tbl

SQL: dict[str, str] = {}

TOP_K = 5
N_QUERIES = 8


def _embed_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def ann_cosine_topk(sf_dir: str):
    """Exact top-k cosine neighbors for query vectors vec_id < N_QUERIES.
    Per-batch partial top-k (matmul against the broadcast query matrix),
    final exact merge on the tiny candidate set."""
    q_df = (tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
            .filter(lambda r: r["vec_id"] < N_QUERIES)
            .to_pandas())
    q_df = q_df.sort_values("vec_id").reset_index(drop=True)
    qm = _embed_matrix(q_df)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((q_df["vec_id"].to_numpy(), qm))

    class Score:
        def __init__(self):
            self.q_ids, self.qm = ray.get(q_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            em = _embed_matrix(batch)
            em /= np.linalg.norm(em, axis=1, keepdims=True)
            sims = self.qm @ em.T  # (n_queries, n_batch)
            ids = batch["vec_id"].to_numpy()
            out = []
            for qi, q_id in enumerate(self.q_ids):
                s = sims[qi]
                mask = ids != q_id
                cand_idx = np.argsort(-s[mask])[:TOP_K]  # partial top-k per batch
                cids = ids[mask][cand_idx]
                out.append(pd.DataFrame({
                    "query_id": np.int64(q_id),
                    "neighbor_id": cids.astype(np.int64),
                    "score": s[mask][cand_idx],
                }))
            return pd.concat(out, ignore_index=True)

    partials = (tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
                .map_batches(Score, batch_format="pandas", concurrency=(1, 4))
                .to_pandas())
    # exact final top-k over the per-batch candidates
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", as_index=False).head(TOP_K).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64") + 1
    out["score"] = out["score"].round(5)
    return out[["query_id", "neighbor_id", "rank", "score"]].reset_index(drop=True)


SQL["ann_cosine_topk"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS s
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(s, 5) AS score
FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def ann_lsh_buckets(sf_dir: str):
    """Scale path: random-hyperplane LSH bucket assignment (16-bit keys,
    deterministic seed=42) → per-bucket counts. At 100 TB the same bucket key
    becomes the shuffle/partition key so each query only probes its bucket
    (plus neighbors). Rows-only oracle (hash-dependent)."""
    dim = 64
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((16, dim))
    planes_ref = ray.put(planes)

    class Bucket:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            em = _embed_matrix(batch)
            bits = (em @ self.planes.T) > 0
            keys = np.packbits(bits.astype(np.uint8), axis=1,
                               bitorder="little")[:, :2]
            bucket = keys[:, 0].astype(np.int64) | (keys[:, 1].astype(np.int64) << 8)
            return pd.DataFrame({"vec_id": batch["vec_id"].astype("int64"),
                                 "bucket": bucket})

    from ray.data.aggregate import Count
    out = (tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
           .map_batches(Bucket, batch_format="pandas", concurrency=(1, 4))
           .groupby("bucket").aggregate(Count(alias_name="n"))
           .to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def knn_label_vote(sf_dir: str):
    """k-NN majority-vote label prediction for the query vectors — an
    embedding-space classification primitive composed from ann_cosine_topk +
    a broadcast label lookup."""
    topk = ann_cosine_topk(sf_dir)
    labels = tbl(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    lookup = dict(zip(labels["vec_id"], labels["label"]))
    topk["nlabel"] = topk["neighbor_id"].map(lookup)

    def vote(g: pd.DataFrame) -> pd.Series:
        counts = g["nlabel"].value_counts()
        top = counts[counts == counts.max()].index.min()  # deterministic tie-break
        return pd.Series({"pred_label": np.int64(top)})

    out = topk.groupby("query_id", as_index=False).apply(vote, include_groups=False)
    out["query_id"] = out["query_id"].astype("int64")
    out["pred_label"] = out["pred_label"].astype("int64")
    return out.sort_values("query_id").reset_index(drop=True)


SQL["knn_label_vote"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.label,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS s
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
  FROM scored
), votes AS (
  SELECT query_id, label, count(*) AS c
  FROM ranked WHERE rank <= {TOP_K} GROUP BY query_id, label
)
SELECT query_id, CAST(min(label) AS BIGINT) AS pred_label
FROM votes v
WHERE c = (SELECT max(c) FROM votes v2 WHERE v2.query_id = v.query_id)
GROUP BY query_id ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# IVF-flat ANN: coarse k-means quantizer + per-centroid inverted lists
# ---------------------------------------------------------------------------

def _kmeans(x: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means (numpy). At 100 TB the trainer would run
    on a sample (the reference's sample-to-decide idiom); centroids are then
    broadcast and assignment is a map_batches matmul."""
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            m = assign == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
    return centroids


def ann_ivf_topk(sf_dir: str, nlist: int = 16, nprobe: int = 4):
    """IVF-flat approximate top-k: train a coarse quantizer, bucket vectors
    by nearest centroid (`groupby(bucket)` is the scale-out partition key),
    then probe only the nprobe closest buckets per query. Approximate →
    rows-only check; recall vs the exact search is asserted in pytest."""
    emb = tbl(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    x = _embed_matrix(emb)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    centroids = _kmeans(xn, nlist)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    cent_ref = ray.put(cn)

    class Assign:
        def __init__(self):
            self.cn = ray.get(cent_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            em = _embed_matrix(batch)
            em /= np.linalg.norm(em, axis=1, keepdims=True)
            bucket = (em @ self.cn.T).argmax(axis=1)
            return pd.DataFrame({"vec_id": batch["vec_id"].astype("int64"),
                                 "bucket": bucket.astype("int64")})

    assignment = (tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
                  .map_batches(Assign, batch_format="pandas", concurrency=(1, 4))
                  .to_pandas())
    id2bucket = dict(zip(assignment["vec_id"], assignment["bucket"]))

    q_ids = sorted(emb["vec_id"][emb["vec_id"] < N_QUERIES])
    id2row = {v: i for i, v in enumerate(emb["vec_id"])}
    out = []
    for q_id in q_ids:
        qv = xn[id2row[q_id]]
        probes = np.argsort(-(cn @ qv))[:nprobe]
        cand_ids = [v for v, b in id2bucket.items()
                    if b in set(probes.tolist()) and v != q_id]
        cand_rows = np.array([id2row[v] for v in cand_ids])
        sims = xn[cand_rows] @ qv
        order = np.argsort(-sims)[:TOP_K]
        for rank, oi in enumerate(order, 1):
            out.append((int(q_id), int(cand_ids[oi]), rank, round(float(sims[oi]), 5)))
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank", "score"])
