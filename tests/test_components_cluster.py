"""Unit tests for connected-components dedup resolution and distributed
k-means: label propagation on a hand-built chain graph (the transitive
case pair-wise dropping gets wrong), survivor accounting, and Lloyd-round
determinism against a NumPy reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges_ds(ray, pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]}))


def test_cc_chain_collapses_to_one_component(ray_session):
    # A-B, B-C, C-D: no direct A-D edge, yet all four must share one rep
    from howard_ray.ops.components import _cc_labels

    labels = _cc_labels(_edges_ds(ray_session, [(2, 1), (2, 3), (3, 4)]))
    out = labels.to_pandas().sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3, 4]
    assert out["label"].tolist() == [1, 1, 1, 1]


def test_cc_separate_components_stay_separate(ray_session):
    from howard_ray.ops.components import _cc_labels

    labels = _cc_labels(_edges_ds(
        ray_session, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)]))
    out = labels.to_pandas().sort_values("node").reset_index(drop=True)
    rep = dict(zip(out["node"], out["label"]))
    assert rep[10] == rep[11] == rep[12] == 10
    assert rep[20] == rep[21] == 20
    assert rep[30] == rep[31] == 30


def test_cc_long_path_converges_within_rounds(ray_session):
    # path graph 0-1-2-...-12: worst-case diameter for min-label
    # propagation; must still reach the global min label everywhere
    from howard_ray.ops.components import _cc_labels

    pairs = [(i, i + 1) for i in range(12)]
    out = (_cc_labels(_edges_ds(ray_session, pairs))
           .to_pandas().sort_values("node"))
    assert set(out["label"]) == {0}
    assert len(out) == 13


def test_kmeans_matches_numpy_reference(ray_session):
    from howard_ray.ops.cluster import kmeans_assign

    sf_dir = "/root/testdata/sf0.001"
    out = kmeans_assign(sf_dir, k=4, rounds=1)

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = X[:4].copy()
    for _ in range(1):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(6)
        a = d2.argmin(axis=1)
        C = np.stack([X[a == c].mean(axis=0) for c in range(4)
                      if (a == c).any()]).round(6)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(6)
    a = d2.argmin(axis=1)
    ref = pd.DataFrame({"cluster": a}).groupby("cluster").size()
    got = dict(zip(out["cluster"], out["n_vecs"]))
    assert got == {int(k): int(v) for k, v in ref.items()}
    inertia_ref = d2[np.arange(len(X)), a].sum()
    assert abs(out["inertia"].sum() - inertia_ref) < 1e-2


def test_dedup_survivors_drops_exactly_non_reps(ray_session):
    # survivors per source must equal total docs minus non-representative
    # members of each duplicate component
    from howard_ray.ops.components import dedup_components, dedup_survivors

    sf_dir = "/root/testdata/sf0.001"
    comp = dedup_components(sf_dir)
    surv = dedup_survivors(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    drops = set(comp.loc[comp["doc_id"] != comp["rep"], "doc_id"])
    kept = docs[~docs["doc_id"].isin(drops)]
    ref = (kept.groupby("source")
               .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
               .reset_index().sort_values("source").reset_index(drop=True))
    assert surv["n_docs"].tolist() == ref["n_docs"].tolist()
    assert surv["sum_chars"].tolist() == ref["sum_chars"].tolist()
    assert surv["source"].tolist() == ref["source"].tolist()


def test_tfidf_topk_small_reference(ray_session):
    # hand-checkable: word shared by every doc gets idf ln(1)=0 and never
    # outranks a source-private word
    from howard_ray.ops.text import tfidf_topk

    out = tfidf_topk("/root/testdata/sf0.001", top=2)
    assert set(out.columns) == {"source", "word", "tfidf"}
    assert (out.groupby("source").size() <= 2).all()
    assert (out["tfidf"] > 0).all()


def test_mixture_sample_budget_tight(ray_session):
    # per source: selected chars <= budget, and the next doc in hash order
    # would overshoot (tightness) — the exact prefix semantics
    from howard_ray.ops.mixture import (DEFAULT_FRAC, MIX_FRACS,
                                        mixture_sample)
    from howard_ray.ops.sampling import _lcg_u64

    sf_dir = "/root/testdata/sf0.001"
    out = mixture_sample(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    h = _lcg_u64(docs["doc_id"].to_numpy())
    docs = docs.assign(h=h).sort_values(["h", "doc_id"])
    for _, row in out.iterrows():
        g = docs[docs["source"] == row["source"]]
        budget = int(np.floor(
            MIX_FRACS.get(row["source"], DEFAULT_FRAC)
            * g["n_chars"].sum()))
        run = g["n_chars"].cumsum().to_numpy()
        n_sel = int((run <= budget).sum())
        assert row["n_docs"] == n_sel
        assert row["sel_chars"] == int(g["n_chars"].iloc[:n_sel].sum())
        assert row["sel_chars"] <= budget


def test_length_buckets_powers_of_two(ray_session):
    from howard_ray.ops.mixture import length_buckets

    out = length_buckets("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["source", "n_chars"])
    assert out["n_docs"].sum() == (docs["n_chars"] > 0).sum()
    # every bucket b holds only docs with 2^b <= n_chars < 2^(b+1)
    b0 = out.iloc[0]
    lo, hi = 2 ** b0["len_bucket"], 2 ** (b0["len_bucket"] + 1)
    g = docs[docs["source"] == b0["source"]]
    n = ((g["n_chars"] >= lo) & (g["n_chars"] < hi)).sum()
    assert b0["n_docs"] == n


def test_embed_quantize_error_bound_and_recompute(ray_session):
    """Int8 SQ reconstruction error obeys the half-step bound, and the
    per-label means match a direct numpy recompute."""
    import numpy as np

    from howard_ray.ops.cluster import embed_quantize

    out = embed_quantize("/root/testdata/sf0.001")
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = X.min(axis=1, keepdims=True), X.max(axis=1, keepdims=True)
    scale = (hi - lo) / 255.0
    safe = np.where(scale == 0.0, 1.0, scale)
    dq = lo + np.where(scale == 0.0, 0.0,
                       np.floor((X - lo) / safe + 0.5) * scale)
    mse = ((X - dq) ** 2).mean(axis=1)
    exp = (pd.DataFrame({"label": emb["label"], "mse": mse,
                         "scale": scale[:, 0]})
           .groupby("label", as_index=False).mean()
           .sort_values("label").reset_index(drop=True))
    assert out["n_vecs"].sum() == len(emb)
    assert np.allclose(out["avg_mse"], exp["mse"], atol=1e-8)
    # max element error is scale/2 -> mse bounded by scale^2/4
    assert (mse <= (scale[:, 0] ** 2) / 4 + 1e-12).all()
