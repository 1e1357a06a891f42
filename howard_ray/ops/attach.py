"""Database-attach sources as driver-visible queries, plus the
percentile-based quality gate (aggregate → broadcast → filter).

Reference anchors: ATTACH DATABASE / sqlite_scan readers
(`database.py:1410-1468`) and the DuckDB-file writer (`database.py:
2472-2499`) — here exercised end-to-end: a side table is materialized
into a .duckdb / .sqlite file, attached back through ``read_duckdb`` /
``read_sqlite`` (ray.data.read_sql), and used as the broadcast side of a
star join, so the oracle can verify the attach round-trip by value.

The quality gate is the canonical large-corpus curation shape the
reference's filter-profile criteria (`variants.py:7676-7704`) map to at
training-data scale: a tiny grouped histogram pass derives per-source
score thresholds (exact quantile_disc semantics), the thresholds are
broadcast, and a second streaming pass filters — no full materialization
at any point.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum

from .util import tbl

SQL: dict[str, str] = {}

_STOP = ("the", "a", "of", "and", "to", "in", "is", "on")


def _side_db_path(sf_dir: str, ext: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        f"side_{base}.{ext}")


def duckdb_attach(sf_dir: str):
    """nation → .duckdb file → read_duckdb attach → broadcast join to
    suppliers → per-nation supplier counts + balance. The attach read is a
    Dataset, so the joined side streams through the same map_batches path
    as any parquet dim table."""
    import duckdb

    from ..sources import read_duckdb

    db = _side_db_path(sf_dir, "duckdb")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    if os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db)
    try:
        nation_pq = os.path.join(sf_dir, "nation.parquet")
        con.execute("CREATE TABLE nation AS SELECT n_nationkey, n_name "
                    f"FROM read_parquet('{nation_pq}')")
    finally:
        con.close()

    dim = read_duckdb(db, table="nation").to_pandas()
    lookup_ref = ray.put(dict(zip(dim["n_nationkey"], dim["n_name"])))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        batch["n_name"] = batch["s_nationkey"].map(lookup)
        return batch[["n_name", "s_acctbal"]]

    out = (tbl(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
           .map_batches(f, batch_format="pandas")
           .groupby("n_name")
           .aggregate(Count(alias_name="n_suppliers"),
                      Sum("s_acctbal", alias_name="s"))
           .to_pandas())
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["total_acctbal"] = out["s"].round(2)
    return (out[["n_name", "n_suppliers", "total_acctbal"]]
            .sort_values("n_name").reset_index(drop=True))


SQL["duckdb_attach"] = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def sqlite_attach(sf_dir: str):
    """region → .sqlite file → read_sqlite attach → broadcast join to
    customers via nation → per-region customer counts."""
    import sqlite3

    import pyarrow.parquet as pq

    from ..sources import read_sqlite

    db = _side_db_path(sf_dir, "sqlite")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    if os.path.exists(db):
        os.remove(db)
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                           columns=["r_regionkey", "r_name"]).to_pandas()
    con = sqlite3.connect(db)
    try:
        region.to_sql("region", con, index=False)
    finally:
        con.close()

    dim = read_sqlite(db, table="region").to_pandas()
    nation = tbl(sf_dir, "nation",
                 ["n_nationkey", "n_regionkey"]).to_pandas()
    r2name = dict(zip(dim["r_regionkey"], dim["r_name"]))
    lookup_ref = ray.put({int(k): r2name[int(v)] for k, v in
                          zip(nation["n_nationkey"], nation["n_regionkey"])})

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        batch["r_name"] = batch["c_nationkey"].map(lookup)
        return batch[["r_name"]]

    out = (tbl(sf_dir, "customer", ["c_nationkey"])
           .map_batches(f, batch_format="pandas")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_customers"))
           .to_pandas())
    out["n_customers"] = out["n_customers"].astype("int64")
    return (out[["r_name", "n_customers"]]
            .sort_values("r_name").reset_index(drop=True))


SQL["sqlite_attach"] = """
SELECT r_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def _score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Integer quality score per doc: floor(1000 * stop-word hits / words).
    Integral so the (source, score) histogram has bounded cardinality and
    the threshold math is exact (no float percentile ambiguity)."""
    split = batch["text"].str.split(" ")
    n_words = split.str.len().to_numpy()
    counts = np.empty(len(batch), dtype=np.int64)
    stop = set(_STOP)
    # flatten once, membership-test vectorized via pandas isin, segment-sum
    if len(batch):
        rows = np.repeat(np.arange(len(batch)), n_words)
        flat = pd.Series(np.concatenate(split.to_numpy()))
        hit = flat.isin(stop).to_numpy()
        counts = np.bincount(rows, weights=hit, minlength=len(batch)).astype(np.int64)
    batch = batch.copy()
    batch["score"] = (counts * 1000) // n_words
    return batch


def quality_gate(sf_dir: str, p: float = 0.75):
    """Percentile quality gate: pass 1 builds a tiny (source, score)
    histogram (partial-aggregated inside map_batches, then one small
    groupby); the driver derives each source's p75 threshold with
    quantile_disc semantics; pass 2 re-streams documents, filters
    score >= threshold(source), and reports per-source survivors. The
    full corpus is never materialized; the only shuffle is over the
    bounded histogram keys."""
    def partial(batch: pa.Table) -> pa.Table:
        df = _score_batch(pa.table({
            "text": batch["text"], "source": batch["source"],
        }).to_pandas())
        t = pa.table({
            "source": pa.array(df["source"]),
            "score": pa.array(df["score"].to_numpy(), type=pa.int64()),
            "one": pa.array(np.ones(len(df), dtype=np.int64)),
        })
        g = t.group_by(["source", "score"]).aggregate([("one", "sum")])
        return pa.table({"source": g["source"], "score": g["score"],
                         "cnt": g["one_sum"]})

    hist = (tbl(sf_dir, "documents", ["source", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "score"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())

    thresholds: dict[str, int] = {}
    for source, g in hist.groupby("source"):
        g = g.sort_values("score")
        cum = g["cnt"].astype("int64").cumsum().to_numpy()
        vals = g["score"].astype("int64").to_numpy()
        n = int(cum[-1])
        idx = int(np.searchsorted(cum, math.ceil(p * n), side="left"))
        thresholds[source] = int(vals[idx])
    thr_ref = ray.put(thresholds)

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(thr_ref)
        batch = _score_batch(batch)
        keep = batch["score"].to_numpy() >= \
            batch["source"].map(thr).to_numpy()
        return batch.loc[keep, ["source", "score"]]

    out = (tbl(sf_dir, "documents", ["source", "text"])
           .map_batches(gate, batch_format="pandas")
           .groupby("source")
           .aggregate(Count(alias_name="n_survivors"),
                      Sum("score", alias_name="score_sum"))
           .to_pandas())
    out["n_survivors"] = out["n_survivors"].astype("int64")
    out["score_sum"] = out["score_sum"].astype("int64")
    out["threshold"] = out["source"].map(thresholds).astype("int64")
    return (out[["source", "threshold", "n_survivors", "score_sum"]]
            .sort_values("source").reset_index(drop=True))


_SCORE_SQL = ("(len(list_filter(string_split(text, ' '), "
              f"w -> w IN {tuple(_STOP)})) * 1000) "
              "// len(string_split(text, ' '))")

SQL["quality_gate"] = f"""
WITH per_doc AS (
  SELECT source, {_SCORE_SQL} AS score FROM documents),
thr AS (
  SELECT source, quantile_disc(score, 0.75)::BIGINT AS threshold
  FROM per_doc GROUP BY source)
SELECT p.source, t.threshold,
       count(*) AS n_survivors, sum(p.score)::BIGINT AS score_sum
FROM per_doc p JOIN thr t ON p.source = t.source
WHERE p.score >= t.threshold
GROUP BY p.source, t.threshold ORDER BY p.source
"""
