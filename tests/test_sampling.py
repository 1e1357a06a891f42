"""Sampling / split / sketch operator properties: parallelism-independent
determinism, split fractions, pigeonhole heavy-hitter exactness, HLL error."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_split_assign_deterministic_and_near_fractions(ray_session):
    from howard_ray.ops.sampling import split_assign

    a = split_assign(SF_DIR)
    b = split_assign(SF_DIR)
    pd.testing.assert_frame_equal(a, b)
    by_split = a.groupby("split")["n_docs"].sum()
    n = by_split.sum()
    # 90/5/5 within sampling noise on a small corpus
    assert 0.85 <= by_split.get("train", 0) / n <= 0.95
    assert by_split.get("val", 0) / n <= 0.10
    assert by_split.get("test", 0) / n <= 0.10


def test_sample_topk_hash_is_order_independent(ray_session):
    """The same k rows are drawn regardless of block layout: membership is a
    pure function of doc_id (LCG is a bijection — no ties)."""
    from howard_ray.ops.sampling import _lcg_u64, sample_topk_hash
    import duckdb

    got = sample_topk_hash(SF_DIR, k=25)
    assert len(got) == 25
    # independent driver-side recompute of the expected winner set
    ids = duckdb.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'").fetchnumpy()["doc_id"]
    u = _lcg_u64(ids.astype(np.uint64))
    expect = set(ids[np.argsort(u)[:25]].tolist())
    assert set(got["doc_id"].tolist()) == expect


def test_heavy_hitters_exact_vs_naive(ray_session):
    from howard_ray.ops.sampling import HH_PHI, heavy_hitters
    import duckdb
    import math

    got = heavy_hitters(SF_DIR)
    naive = duckdb.sql(f"""
        WITH w AS (SELECT unnest(string_split(text,' ')) AS word
                   FROM '{SF_DIR}/documents.parquet'),
        tot AS (SELECT count(*) n FROM w)
        SELECT word, count(*) cnt FROM w GROUP BY word
        HAVING cnt >= ceil({HH_PHI} * (SELECT n FROM tot))
        ORDER BY word""").fetchdf()
    assert got["word"].tolist() == naive["word"].tolist()
    assert got["cnt"].tolist() == naive["cnt"].astype("int64").tolist()


def test_approx_distinct_within_error(ray_session):
    from howard_ray.ops.sampling import approx_distinct_words

    row = approx_distinct_words(SF_DIR).iloc[0]
    assert row["rel_err"] < 0.05
    assert row["estimate"] > 0 and row["exact"] > 0


def test_sample_stratified_k_per_source(ray_session):
    from howard_ray.ops.sampling import sample_stratified

    got = sample_stratified(SF_DIR, k=5)
    per_src = got.groupby("source").size()
    assert (per_src <= 5).all()
    # deterministic across runs
    pd.testing.assert_frame_equal(got, sample_stratified(SF_DIR, k=5))


def test_quantiles_exact_matches_sort(ray_session):
    from howard_ray.ops.sampling import quantiles_exact
    import duckdb
    import math

    got = quantiles_exact(SF_DIR)
    vals = duckdb.sql(
        f"SELECT n_chars FROM '{SF_DIR}/documents.parquet' ORDER BY n_chars"
    ).fetchnumpy()["n_chars"]
    n = len(vals)
    for _, row in got.iterrows():
        assert row["value"] == int(vals[math.ceil(row["p"] * n) - 1])


def test_hll_registers_merge_equals_union():
    """Mergeability: max(regs(A), regs(B)) == regs(A ∪ B)."""
    from howard_ray.ops.sampling import _hll_estimate, _hll_registers

    rng_a = np.array([f"w{i}" for i in range(5000)], dtype=object)
    rng_b = np.array([f"w{i}" for i in range(2500, 9000)], dtype=object)
    merged = np.maximum(_hll_registers(rng_a), _hll_registers(rng_b))
    union = _hll_registers(np.array([f"w{i}" for i in range(9000)], dtype=object))
    assert np.array_equal(merged, union)
    est = _hll_estimate(union)
    assert abs(est - 9000) / 9000 < 0.05


def test_export_split_shards_layout(ray_session, tmp_path):
    """Hive layout exists per (split, source) and read-back totals equal
    the pure-function assignment."""
    import os
    from howard_ray.ops.sampling import export_split_shards, split_assign

    out = str(tmp_path / "shards")
    back = export_split_shards(SF_DIR, out)
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert "split=train" in splits
    assign = split_assign(SF_DIR)
    merged = back.merge(assign, on=["split", "source"], suffixes=("", "_want"))
    assert len(merged) == len(assign) == len(back)
    assert (merged["sum_chars"] == merged["sum_chars_want"]).all()
