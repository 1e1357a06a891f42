"""End-to-end corpus curation: the composite pipeline a pretraining-data
run executes before tokenization — quality gate → exact dedup → split
assignment — fused into one streaming Ray plan, plus the mixture *plan*
(temperature-weighted source reweighting) and deterministic shard
assignment for epoch shuffling.

This is the LLM-data twin of ``ops/process.py:process_pipeline`` (the
reference's ``howard process`` composite, tools/process.py:41-103): a
chain of per-batch passes with exactly ONE all-to-all exchange (the dedup
co-shuffle over quality survivors), everything else partial-aggregated or
row-pure.

Scale notes (100 TB):
- the quality gate is a stateless vectorized ``map_batches`` pass — the
  duplicate-word fraction reuses the exploded-groupby kernel from
  ``ops/text.py:repetition_filter`` (no per-row Python);
- dedup shuffles only the gate's survivors, bucketed by text hash
  (``dedup_exact``'s collision-safe shape), and each bucket reduces to its
  survivor set with one vectorized pandas groupby;
- split assignment is row-pure (LCG over doc_id, ``ops/sampling.py``), so
  the final stats are one bounded-key aggregate;
- the mixture plan's only distributed work is a per-source char-sum
  aggregate (#sources rows); the temperature math is driver-side on that
  constant-size table;
- shard assignment is a pure hash → no sort, no shuffle: an "epoch
  shuffle" at this scale is bucketing into shard files read in shard-id
  order, and the operator reports the per-shard balance that validates it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from ..pipeline import stable_hash_u64
from .sampling import _HASH_SQL, _lcg_u64, TRAIN_HI, VAL_HI
from .text import REP_THRESHOLD
from .util import tbl

SQL: dict[str, str] = {}

# quality gate: docs shorter than this or with a duplicate-word fraction
# above CURATE_DUP are dropped before dedup
CURATE_MIN_CHARS = 100
CURATE_DUP = 0.6
N_DEDUP_BUCKETS = 256

# mixture plan: sampling temperature (weights ∝ share^ALPHA) and the
# overall char budget as a fraction of the corpus
MIX_ALPHA = 0.7
BUDGET_FRAC = 0.5

# training-shard sizing: shard count derives from corpus char mass so a
# shard's payload stays bounded at any scale (round-5 item #1); both the
# Ray side and the SQL twin compute n = clamp(ceilint(sum_chars/TARGET),
# 16, 2^20) with INTEGER arithmetic so they can never disagree
SHARD_CHAR_TARGET = 100_000
SHARD_MIN, SHARD_MAX = 16, 1 << 20


def n_shards_for(sum_chars: int) -> int:
    need = (int(sum_chars) + SHARD_CHAR_TARGET - 1) // SHARD_CHAR_TARGET
    return min(max(need, SHARD_MIN), SHARD_MAX)


EPOCH_SALT = 0x9E3779B97F4A7C15  # golden-ratio odd constant (public)


def _dup_frac(batch: pd.DataFrame) -> np.ndarray:
    """Per-doc duplicate-word fraction, vectorized (one exploded groupby
    per batch) — same kernel and SQL semantics as repetition_filter."""
    words = batch["text"].str.split(" ")
    lens = words.str.len().to_numpy(np.int64)
    flat = (np.concatenate(words.to_numpy()) if len(batch)
            else np.array([], dtype=object))
    row = np.repeat(np.arange(len(batch)), lens)
    nuniq = (pd.DataFrame({"r": row, "w": flat})
             .groupby("r")["w"].nunique()
             .reindex(range(len(batch)), fill_value=0).to_numpy())
    return 1.0 - nuniq / np.maximum(lens, 1)


def curate_pipeline(sf_dir: str):
    """Composite curation: quality gate (length + repetition) → exact
    dedup (survivor = min doc_id per text) → deterministic 90/5/5 split →
    per-(source, split) doc/char counts of the curated corpus."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "text", "n_chars"])

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        dup = _dup_frac(batch)
        keep = ((batch["n_chars"].to_numpy() >= CURATE_MIN_CHARS)
                & (dup <= CURATE_DUP))
        out = batch.loc[keep, ["doc_id", "source", "text", "n_chars"]]
        h = stable_hash_u64(pa.array(out["text"].to_numpy(dtype=object)))
        return out.assign(b=(h % np.uint64(N_DEDUP_BUCKETS))
                          .view(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # survivor = lowest doc_id per exact text (collision-safe: the
        # group key is the text itself, the bucket only co-locates it)
        surv = (g.sort_values("doc_id")
                 .groupby("text", as_index=False)
                 .first())
        return surv[["doc_id", "source", "n_chars"]]

    def split_stats(batch: pa.Table) -> pa.Table:
        hi = _lcg_u64(batch["doc_id"].to_numpy()) >> np.uint64(32)
        split = np.where(hi < TRAIN_HI, "train",
                         np.where(hi < VAL_HI, "val", "test"))
        t = pa.table({
            "source": batch["source"],
            "split": pa.array(split),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        g = t.group_by(["source", "split"]).aggregate(
            [("one", "sum"), ("n_chars", "sum")])
        return pa.table({"source": g["source"], "split": g["split"],
                         "n_docs": g["one_sum"],
                         "sum_chars": g["n_chars_sum"]})

    out = (ds.map_batches(gate, batch_format="pandas")
             .groupby("b").map_groups(per_bucket, batch_format="pandas")
             .map_batches(split_stats, batch_format="pyarrow")
             .groupby(["source", "split"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_chars", alias_name="sum_chars"))
             .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out.sort_values(["source", "split"]).reset_index(drop=True)


SQL["curate_pipeline"] = f"""
WITH q AS (
  SELECT doc_id, source, text, n_chars,
         1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE
             / greatest(len(string_split(text, ' ')), 1) AS dup_frac
  FROM documents),
f AS (
  SELECT * FROM q
  WHERE n_chars >= {CURATE_MIN_CHARS} AND dup_frac <= {CURATE_DUP}),
d AS (
  SELECT * FROM f
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
h AS (
  SELECT source, n_chars, ({_HASH_SQL} // 4294967296) AS hi FROM d)
SELECT source,
  CASE WHEN hi < {TRAIN_HI} THEN 'train'
       WHEN hi < {VAL_HI} THEN 'val' ELSE 'test' END AS split,
  count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM h GROUP BY source, split ORDER BY source, split
"""


def mixture_plan(sf_dir: str):
    """Temperature-weighted mixture plan: per-source sampling weight
    ∝ (char share)^ALPHA, the standard multilingual/multi-source
    rebalancing rule; reports weight and the implied epochs over each
    source for a BUDGET_FRAC-of-corpus token budget (epochs > 1 =
    upsampled source). Distributed work = one #sources-row aggregate."""
    ds = tbl(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch["source"],
                      "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        g = t.group_by("source").aggregate([("n_chars", "sum")])
        return pa.table({"source": g["source"],
                         "chars": g["n_chars_sum"]})

    tot = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("chars", alias_name="chars"))
             .to_pandas())
    chars = tot["chars"].to_numpy(np.float64)
    total = chars.sum()
    pw = np.power(chars / total, MIX_ALPHA)
    w = np.round(pw / pw.sum(), 6)
    epochs = np.round(w * BUDGET_FRAC * total / chars, 4)
    out = pd.DataFrame({
        "source": tot["source"],
        "total_chars": tot["chars"].astype("int64"),
        "weight": w,
        "epochs": epochs})
    return out.sort_values("source").reset_index(drop=True)


SQL["mixture_plan"] = f"""
WITH t AS (
  SELECT source, sum(n_chars)::DOUBLE AS chars FROM documents
  GROUP BY source),
w AS (
  SELECT source, chars,
         pow(chars / (SELECT sum(chars) FROM t), {MIX_ALPHA}) AS pw
  FROM t)
SELECT source, chars::BIGINT AS total_chars,
  round(pw / (SELECT sum(pw) FROM w), 6) AS weight,
  round(round(pw / (SELECT sum(pw) FROM w), 6)
        * {BUDGET_FRAC} * (SELECT sum(chars) FROM t) / chars, 4) AS epochs
FROM w ORDER BY source
"""


def shuffle_shards(sf_dir: str):
    """Deterministic epoch-shuffle shard assignment: shard =
    LCG(doc_id XOR epoch_salt) mod n_shards — a pure row function, so no
    sort and no shuffle is needed to "globally shuffle" an epoch: writers
    bucket rows into shard files and the trainer reads shards in id order.
    The shard count derives from the corpus char mass (n_shards_for), so
    per-shard payload is bounded at any sf. Reports per-shard doc count,
    char mass and distinct sources — the balance check that validates the
    shuffle quality."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    total_chars = int(tbl(sf_dir, "documents", ["n_chars"])
                      .sum("n_chars"))
    n_shards = n_shards_for(total_chars)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = _lcg_u64(ids ^ np.uint64(EPOCH_SALT))
        shard = (h % np.uint64(n_shards)).view(np.int64)
        t = pa.table({
            "shard": pa.array(shard),
            "source": batch["source"],
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        g = t.group_by(["shard", "source"]).aggregate(
            [("one", "sum"), ("n_chars", "sum")])
        return pa.table({"shard": g["shard"], "source": g["source"],
                         "n_docs": g["one_sum"],
                         "sum_chars": g["n_chars_sum"]})

    per_src = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby(["shard", "source"])
                 .aggregate(Sum("n_docs", alias_name="n_docs"),
                            Sum("sum_chars", alias_name="sum_chars"))
                 .to_pandas())
    out = (per_src.groupby("shard", as_index=False)
           .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"),
                n_sources=("source", "nunique")))
    for c in ["n_docs", "sum_chars", "n_sources"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


_SHARD_HASH = (f"((6364136223846793005::HUGEINT"
               f" * xor(doc_id::UBIGINT, {EPOCH_SALT}::UBIGINT)::HUGEINT"
               f" + 1442695040888963407) % 18446744073709551616::HUGEINT)")

SQL["shuffle_shards"] = f"""
WITH ns AS (
  SELECT LEAST(GREATEST((sum(n_chars) + {SHARD_CHAR_TARGET - 1})
                        // {SHARD_CHAR_TARGET}, {SHARD_MIN}),
               {SHARD_MAX}) AS n
  FROM documents),
h AS (
  SELECT (({_SHARD_HASH}) % (SELECT n FROM ns))::BIGINT AS shard,
         source, n_chars
  FROM documents)
SELECT shard, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
       count(DISTINCT source) AS n_sources
FROM h GROUP BY shard ORDER BY shard
"""


def curate_store(sf_dir: str):
    """End-to-end integration of the curation ops with the columnar
    engine: quality gate → exact dedup → survivors written to parquet →
    encoded through the FLAGSHIP salted-cluster pipeline → decoded →
    per-source aggregate of the decoded curated corpus. The oracle
    aggregates the same curation CTE chain in DuckDB, so one value-hash
    ties gate + dedup + encode + block store + decode together."""
    import os
    import shutil
    import tempfile

    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..pipeline import decode_store, encode_dataset

    ds = tbl(sf_dir, "documents", ["doc_id", "source", "text", "n_chars"])

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        dup = _dup_frac(batch)
        keep = ((batch["n_chars"].to_numpy() >= CURATE_MIN_CHARS)
                & (dup <= CURATE_DUP))
        out = batch.loc[keep, ["doc_id", "source", "text", "n_chars"]]
        h = stable_hash_u64(pa.array(out["text"].to_numpy(dtype=object)))
        return out.assign(b=(h % np.uint64(N_DEDUP_BUCKETS))
                          .view(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        surv = (g.sort_values("doc_id")
                 .groupby("text", as_index=False)
                 .first())
        return surv[["doc_id", "source", "n_chars"]]

    tag = os.path.basename(os.path.normpath(sf_dir))
    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    cur_dir = os.path.join(cache, f"curated_{tag}")
    store = os.path.join(cache, f"store_curated_{tag}")
    shutil.rmtree(cur_dir, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    (ds.map_batches(gate, batch_format="pandas")
       .groupby("b").map_groups(per_bucket, batch_format="pandas")
       .write_parquet(cur_dir))
    encode_dataset(cur_dir, store, mode="cluster", target_rows=20_000,
                   resume=False)
    out = (decode_store(store)
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_chars", alias_name="sum_chars"),
                      Sum("doc_id", alias_name="sum_ids"))
           .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["curate_store"] = f"""
WITH q AS (
  SELECT doc_id, source, text, n_chars,
         1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE
             / greatest(len(string_split(text, ' ')), 1) AS dup_frac
  FROM documents),
f AS (
  SELECT * FROM q
  WHERE n_chars >= {CURATE_MIN_CHARS} AND dup_frac <= {CURATE_DUP}),
d AS (
  SELECT * FROM f
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
       sum(doc_id)::BIGINT AS sum_ids
FROM d GROUP BY source ORDER BY source
"""
