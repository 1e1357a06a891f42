"""Distributed k-means over the embeddings table — the clustering stage a
training-data pipeline runs for semantic dedup bucketing, data-mixture
curation, and IVF coarse quantizer training (ops/similarity.py trains its
quantizer on a sample; this is the full-corpus refinement of the same
shape).

Ray-Data shape (the only scale-safe one):
- centroids are TINY (k × d floats) → broadcast via ``ray.put`` once per
  Lloyd round, read zero-copy inside every task;
- each round is ONE stateless ``map_batches`` pass emitting per-batch
  partial sums (k rows: per-cluster vector sum + count) — the classic
  combiner discipline, so the "shuffle" is k rows per batch, not N rows;
- the driver folds the k-row partials (k × d doubles — constant size) and
  re-broadcasts. Nothing driver-side grows with the data.

Determinism across engines and parallelism levels (hash-match oracle
discipline): distances are squared-Euclidean in float64 rounded to 6dp
BEFORE the argmin (ties then break to the lowest cluster id — numpy's
first-min and the SQL ``ORDER BY d2, cid`` agree); recomputed centroids
are rounded to 6dp before the next round, burying both engines'
summation-order noise (~1e-12) far below the rounding quantum. The oracle
is the full algorithm in SQL: init = the k lowest vec_ids, one
re-estimation round, final assignment — distances via unnest in DOUBLE
(DuckDB's list_distance computes in float32, measured 3e-8 off float64,
too coarse for a hash-matched twin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import tbl

SQL: dict[str, str] = {}

K = 8


def _assign_partials(centroids: np.ndarray):
    """map_batches kernel: per-batch per-cluster (count, vector sum,
    inertia) partials under the given (k, d) float64 centroids."""
    c_ref = ray.put(centroids)

    def f(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        # zero-copy-ish Arrow list → (n, d) matrix: flatten the list
        # values buffer and reshape (embeddings are fixed-dim)
        col = batch["embedding"].combine_chunks()
        if len(col) == 0:
            X = np.zeros((0, centroids.shape[1]), dtype=np.float64)
        else:
            import pyarrow.compute as _pc
            flat = _pc.list_flatten(col).to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64).reshape(len(col), -1)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(6)
        assign = d2.argmin(axis=1)             # first min = lowest cid
        best = d2[np.arange(len(X)), assign]
        k, d = C.shape
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, X)
        inertia = np.bincount(assign, weights=best, minlength=k)
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "n": pa.array(counts),
            "inertia": pa.array(inertia),
            "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
        })
    return f


def _fold_partials(parts: pd.DataFrame, k: int):
    """Driver-side fold of the k-rows-per-batch partials (constant size)."""
    counts = np.zeros(k, dtype=np.int64)
    inertia = np.zeros(k, dtype=np.float64)
    sums = None
    for cid, n, inr, vs in zip(parts["cid"], parts["n"], parts["inertia"],
                               parts["vsum"]):
        v = np.asarray(vs, dtype=np.float64)
        if sums is None:
            sums = np.zeros((k, v.shape[0]), dtype=np.float64)
        counts[cid] += n
        inertia[cid] += inr
        sums[cid] += v
    return counts, sums, inertia


def kmeans_assign(sf_dir: str, k: int = K, rounds: int = 1):
    """k-means over ``embeddings``: deterministic init (the k lowest
    vec_ids), ``rounds`` Lloyd re-estimation rounds, final assignment;
    returns per-cluster size and inertia (sum of squared distances)."""
    ds = tbl(sf_dir, "embeddings", ["vec_id", "embedding"])

    # init: k rows with the smallest vec_id — per-batch partial top-k
    # (k rows leave each batch), tiny driver merge; no sort shuffle
    def smallest(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        take = np.argsort(ids)[:k]
        return batch.take(take)

    cand = ds.map_batches(smallest, batch_format="pyarrow").to_pandas()
    cand = cand.nsmallest(k, "vec_id").sort_values("vec_id")
    C = np.asarray(cand["embedding"].to_list(), dtype=np.float64)

    for _ in range(rounds):
        parts = (ds.map_batches(_assign_partials(C), batch_format="pyarrow")
                   .to_pandas())
        counts, sums, _ = _fold_partials(parts, k)
        nonempty = counts > 0
        # empty clusters drop out (the SQL GROUP BY does the same); keep
        # row order by cid so cluster ids stay aligned with the oracle
        C = (sums[nonempty] / counts[nonempty, None]).round(6)
        cids = np.flatnonzero(nonempty)
        if len(cids) < k:
            # re-index: surviving centroids keep their original cid via a
            # parallel id array
            pass
        cid_map = cids

    parts = (ds.map_batches(_assign_partials(C), batch_format="pyarrow")
               .to_pandas())
    counts, _, inertia = _fold_partials(parts, len(C))
    out = pd.DataFrame({
        "cluster": cid_map.astype("int64"),
        "n_vecs": counts.astype("int64"),
        "inertia": np.round(inertia, 2),
    })
    out = out[out["n_vecs"] > 0]
    return out.sort_values("cluster").reset_index(drop=True)


SQL["kmeans_assign"] = f"""
WITH init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS c
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {K})
), d1 AS (
  SELECT e.vec_id, i.cid,
         round((SELECT sum((ux.x - ux.y) * (ux.x - ux.y)) FROM (
            SELECT unnest(e.embedding)::DOUBLE AS x,
                   unnest(i.c)::DOUBLE AS y) ux), 6) AS d2
  FROM embeddings e CROSS JOIN init i
), a1 AS (
  SELECT vec_id, cid FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
), m AS (
  SELECT a1.cid, u.pos, round(avg(u.x), 6) AS mx
  FROM a1 JOIN embeddings e USING (vec_id),
       LATERAL (SELECT unnest(e.embedding)::DOUBLE AS x,
                       unnest(generate_series(1, len(e.embedding))) AS pos) u
  GROUP BY a1.cid, u.pos
), c2 AS (
  SELECT cid, list(mx ORDER BY pos) AS c FROM m GROUP BY cid
), d2t AS (
  SELECT e.vec_id, c2.cid,
         round((SELECT sum((ux.x - ux.y) * (ux.x - ux.y)) FROM (
            SELECT unnest(e.embedding)::DOUBLE AS x,
                   unnest(c2.c) AS y) ux), 6) AS d2
  FROM embeddings e CROSS JOIN c2
), a2 AS (
  SELECT vec_id, cid, d2 FROM d2t
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)
SELECT cid AS cluster, count(*) AS n_vecs, round(sum(d2), 2) AS inertia
FROM a2 GROUP BY cid ORDER BY cid
"""


def embed_quantize(sf_dir: str):
    """Int8 scalar quantization of the embedding store (the standard
    vector-DB compression step before ANN at scale): per-vector min/max
    affine map onto 0..255, report per-label vector count, mean
    reconstruction MSE and mean quantization step — the accuracy/size
    trade-off table for a 4x smaller store. One stateless vectorized pass +
    a label-bounded aggregate; rounding is floor(x+0.5) so the Ray and SQL
    paths share exact tie semantics (no banker's rounding)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = tbl(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        if len(col) == 0:
            return pa.table({"label": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "mse": pa.array([], pa.float64()),
                             "scale": pa.array([], pa.float64())})
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        X = flat.astype(np.float64).reshape(len(col), -1)
        lo = X.min(axis=1, keepdims=True)
        hi = X.max(axis=1, keepdims=True)
        scale = (hi - lo) / 255.0
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor((X - lo) / safe + 0.5)
        dq = lo + np.where(scale == 0.0, 0.0, q * scale)
        mse = ((X - dq) ** 2).mean(axis=1)
        t = pa.table({"label": batch["label"],
                      "one": pa.array(np.ones(len(col), dtype=np.int64)),
                      "mse": pa.array(mse),
                      "scale": pa.array(scale[:, 0])})
        g = t.group_by("label").aggregate(
            [("one", "sum"), ("mse", "sum"), ("scale", "sum")])
        return pa.table({"label": g["label"], "n": g["one_sum"],
                         "mse": g["mse_sum"], "scale": g["scale_sum"]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("label")
             .aggregate(Sum("n", alias_name="n_vecs"),
                        Sum("mse", alias_name="s_mse"),
                        Sum("scale", alias_name="s_scale"))
             .to_pandas())
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["avg_mse"] = (out["s_mse"] / out["n_vecs"]).round(9)
    out["avg_scale"] = (out["s_scale"] / out["n_vecs"]).round(9)
    return (out[["label", "n_vecs", "avg_mse", "avg_scale"]]
            .sort_values("label").reset_index(drop=True))


SQL["embed_quantize"] = """
WITH x AS (
  SELECT vec_id, label, unnest(embedding)::DOUBLE AS v FROM embeddings),
s AS (
  SELECT vec_id, label, min(v) AS lo, max(v) AS hi,
         (max(v) - min(v)) / 255.0 AS scale
  FROM x GROUP BY vec_id, label),
d AS (
  SELECT x.vec_id, x.label,
         avg(pow(x.v - (s.lo + (CASE WHEN s.scale = 0 THEN 0
              ELSE floor((x.v - s.lo) / s.scale + 0.5) END) * s.scale), 2))
           AS mse,
         any_value(s.scale) AS scale
  FROM x JOIN s USING (vec_id, label)
  GROUP BY x.vec_id, x.label)
SELECT label, count(*) AS n_vecs, round(avg(mse), 9) AS avg_mse,
       round(avg(scale), 9) AS avg_scale
FROM d GROUP BY label ORDER BY label
"""
