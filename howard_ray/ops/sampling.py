"""Distributed sampling / splitting / sketching operators — the
training-data-pipeline layer a 100 TB corpus run needs before anything else:
deterministic train/val/test assignment, uniform subsampling, heavy-hitter
extraction, and approximate distinct counting.

Design rules (same as the rest of the engine):
- determinism across processes and parallelism levels: membership is a pure
  function of the row (an LCG over ``doc_id``), never of batch order or
  worker id — identical output at num_cpus=8 and 32, and an exact SQL twin
  exists (HUGEINT arithmetic mod 2^64 in DuckDB matches numpy's wrapping
  uint64);
- per-batch partials + one bounded-key aggregate: nothing driver-side grows
  with the data (candidate sets are bounded by 1/phi per batch; sketch
  summaries are constant-size);
- heavy hitters use the pigeonhole guarantee, not a lossy sketch: a word
  with global frequency >= phi must have local frequency >= phi in at least
  one batch, so per-batch local-fraction pruning yields a guaranteed
  candidate superset and the second exact-count pass makes the result
  EXACT (hence SQL-oracle-checkable) while only ever shuffling the
  candidates.

Reference parity: the reference's sampling surface is DuckDB's
``USING SAMPLE`` / LIMIT previews (howard/objects/variants.py query paths);
these operators are the scale-out replacements.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from .util import tbl

SQL: dict[str, str] = {}

# MMIX LCG constants (Knuth): a is odd -> x |-> (a*x+c) mod 2^64 is a
# bijection, so hash values over distinct doc_ids are distinct (no ties).
LCG_A = 6364136223846793005
LCG_C = 1442695040888963407
TWO64 = 1 << 64

# split thresholds on the high 32 bits: floor(frac * 2^32)
TRAIN_HI = 3865470566   # floor(0.90 * 2^32)
VAL_HI = 4080218931     # floor(0.95 * 2^32)


def _lcg_u64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (np.uint64(LCG_A) * x.astype(np.uint64)) + np.uint64(LCG_C)


_HASH_SQL = (f"(({LCG_A}::HUGEINT * doc_id + {LCG_C})"
             f" % {TWO64}::HUGEINT)")


def split_assign(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment by LCG(doc_id) high
    bits, reported as per-(source, split) doc and char counts. The
    assignment is row-pure: re-running on any cluster size, any block
    layout, or a resumed job yields the same split — the property a
    training-data pipeline needs so shards can be (re)assigned
    independently on every worker without coordination."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        hi = _lcg_u64(batch["doc_id"].to_numpy()) >> np.uint64(32)
        split = np.where(hi < TRAIN_HI, "train",
                         np.where(hi < VAL_HI, "val", "test"))
        t = pa.table({
            "source": batch["source"],
            "split": pa.array(split),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
        })
        g = t.group_by(["source", "split"]).aggregate(
            [("one", "sum"), ("n_chars", "sum")])
        return pa.table({"source": g["source"], "split": g["split"],
                         "n_docs": g["one_sum"],
                         "sum_chars": g["n_chars_sum"]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "split"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_chars", alias_name="sum_chars"))
             .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out.sort_values(["source", "split"]).reset_index(drop=True)


SQL["split_assign"] = f"""
WITH h AS (
  SELECT source, n_chars, ({_HASH_SQL} // 4294967296) AS hi
  FROM documents)
SELECT source,
  CASE WHEN hi < {TRAIN_HI} THEN 'train'
       WHEN hi < {VAL_HI} THEN 'val' ELSE 'test' END AS split,
  count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM h GROUP BY source, split ORDER BY source, split
"""


SAMPLE_K = 100


def sample_topk_hash(sf_dir: str, k: int = SAMPLE_K):
    """Deterministic uniform k-sample: the k rows with the smallest
    LCG(doc_id) — a fixed-size exact uniform sample computed as per-batch
    partial top-k (argpartition) + a tiny final merge of n_batches*k
    candidate rows; no shuffle, no driver-side full pass. Unlike reservoir
    sampling it is order- and parallelism-independent, so the same sample
    is drawn on every cluster size (the LCG is a bijection — no ties)."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        u = _lcg_u64(batch["doc_id"].to_numpy())
        if u.size > k:
            idx = np.argpartition(u, k - 1)[:k]
            batch, u = batch.take(pa.array(idx)), u[idx]
        return batch.append_column("hsig", pa.array(u.view(np.int64)))

    cand = (ds.map_batches(partial, batch_format="pyarrow").to_pandas())
    u = cand["hsig"].to_numpy().view(np.uint64)
    top = cand.iloc[np.argsort(u, kind="stable")[:k]]
    return (top[["doc_id", "source", "n_chars", "hsig"]]
            .sort_values("doc_id").reset_index(drop=True))


SQL["sample_topk_hash"] = f"""
WITH h AS (
  SELECT doc_id, source, n_chars, {_HASH_SQL} AS u FROM documents)
SELECT doc_id, source, n_chars,
  (CASE WHEN u >= 9223372036854775808::HUGEINT
        THEN u - {TWO64}::HUGEINT ELSE u END)::BIGINT AS hsig
FROM h ORDER BY u LIMIT {SAMPLE_K}
"""


HH_PHI = 0.005  # heavy-hitter frequency threshold


def heavy_hitters(sf_dir: str, phi: float = HH_PHI):
    """EXACT corpus-level heavy hitters (words with frequency >= phi)
    without ever shuffling the full word stream. Pass 1 keeps, per batch,
    only words whose LOCAL fraction is >= phi — by pigeonhole any word with
    global fraction >= phi exceeds phi in at least one batch, so the union
    (<= 1/phi candidates per batch) is a guaranteed superset. Pass 2
    broadcast-filters to candidates and computes exact global counts; the
    final filter cnt >= ceil(phi*N) makes the output exact, so the DuckDB
    twin is a plain GROUP BY ... HAVING. This is the scale shape: the
    all-words groupby (explode_word_counts) moves every distinct word
    through the exchange; this moves only the candidates."""
    ds = tbl(sf_dir, "documents", ["text"])

    def word_counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def local_candidates(batch: pa.Table) -> pa.Table:
        t = word_counts(batch)
        n_b = pc.sum(t["cnt"]).as_py() or 0
        if not n_b:
            return t.slice(0, 0)
        keep = pc.greater_equal(t["cnt"], pa.scalar(int(math.ceil(phi * n_b)),
                                                    type=pa.int64()))
        return t.filter(keep)

    # pass 1: candidate superset + total word count (both tiny)
    cand_tbl = (ds.map_batches(local_candidates, batch_format="pyarrow")
                  .to_pandas())
    candidates = sorted(set(cand_tbl["word"].tolist()))
    n_total = int(ds.map_batches(word_counts, batch_format="pyarrow")
                    .aggregate(Sum("cnt", alias_name="n"))["n"])
    cand_ref = ray.put(pa.array(candidates))

    def exact_counts(batch: pa.Table) -> pa.Table:
        # Arrow is_in against the broadcast candidate array — no per-word
        # Python membership loop
        cands = ray.get(cand_ref)
        t = word_counts(batch)
        return t.filter(pc.is_in(t["word"].combine_chunks(),
                                 value_set=cands))

    out = (ds.map_batches(exact_counts, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    thresh = math.ceil(phi * n_total)
    out["cnt"] = out["cnt"].astype("int64")
    out = out[out["cnt"] >= thresh].copy()
    out["pct"] = (out["cnt"] * 100.0 / n_total).round(4)
    return out.sort_values("word").reset_index(drop=True)


SQL["heavy_hitters"] = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
tot AS (SELECT count(*) AS n FROM w),
c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
SELECT word, cnt,
       ROUND(cnt * 100.0 / (SELECT n FROM tot), 4) AS pct
FROM c WHERE cnt >= ceil({HH_PHI} * (SELECT n FROM tot))
ORDER BY word
"""


STRAT_K = 20


def sample_stratified(sf_dir: str, k: int = STRAT_K):
    """Deterministic stratified sample: the k smallest-LCG(doc_id) rows PER
    SOURCE. Per-batch partial per-source top-k (pandas groupby+nsmallest on
    an already-hashed column) + a tiny per-source final merge — the shuffle
    carries at most n_batches*k rows per source. Exact SQL twin via
    row_number() over the same hash order (the LCG is a bijection, so the
    order is total and the winner set unique)."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hsig"] = _lcg_u64(df["doc_id"].to_numpy()).view(np.int64)
        # uint order == int64-view order shifted: compare in uint space
        df["_u"] = df["hsig"].to_numpy().view(np.uint64)
        keep = (df.sort_values("_u").groupby("source", sort=False).head(k))
        return pa.Table.from_pandas(keep.drop(columns="_u"),
                                    preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand["_u"] = cand["hsig"].to_numpy().view(np.uint64)
    top = cand.sort_values("_u").groupby("source", sort=False).head(k)
    return (top[["doc_id", "source", "hsig"]]
            .sort_values(["source", "doc_id"]).reset_index(drop=True))


SQL["sample_stratified"] = f"""
WITH h AS (
  SELECT doc_id, source, {_HASH_SQL} AS u FROM documents)
SELECT doc_id, source,
  (CASE WHEN u >= 9223372036854775808::HUGEINT
        THEN u - {TWO64}::HUGEINT ELSE u END)::BIGINT AS hsig
FROM h
QUALIFY row_number() OVER (PARTITION BY source ORDER BY u) <= {STRAT_K}
ORDER BY source, doc_id
"""


QUANTILE_PS = [0.25, 0.5, 0.75, 0.9, 0.99]


def quantiles_exact(sf_dir: str, ps: list[float] = QUANTILE_PS):
    """EXACT distributed quantiles of a bounded-cardinality int column
    (n_chars) via a mergeable value-histogram: each batch emits its
    (value, cnt) counts, one small groupby merges them, and the driver walks
    the tiny distinct-value histogram (cumsum) — the full column never
    shuffles and no sort happens. Matches DuckDB quantile_disc semantics:
    the smallest value whose cumulative count >= ceil(p*n)."""
    ds = tbl(sf_dir, "documents", ["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["n_chars"])
        return pa.table({"v": pc.cast(vc.field("values"), pa.int64()),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("v").reset_index(drop=True))
    cum = hist["cnt"].astype("int64").cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist["v"].astype("int64").to_numpy()
    rows = []
    for p in ps:
        target = math.ceil(p * n)
        idx = int(np.searchsorted(cum, target, side="left"))
        rows.append({"p": p, "value": int(vals[idx])})
    return pd.DataFrame(rows)


SQL["quantiles_exact"] = " UNION ALL ".join(
    f"SELECT {p} AS p, quantile_disc(n_chars, {p})::BIGINT AS value"
    " FROM documents" for p in QUANTILE_PS)


HLL_P = 12  # 2^12 = 4096 registers, ~1.04/sqrt(m) = 1.6% std error


def _hll_registers(words: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """One batch's HyperLogLog register array (mergeable by elementwise
    max). Hash = pandas' vectorized SipHash (fixed key — deterministic
    across processes)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    if words.size == 0:
        return regs
    h = pd.util.hash_array(words).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading zeros of the (64-p)-bit remainder + 1
    rho = np.empty(rem.size, dtype=np.int8)
    nz = rem > 0
    # rem < 2^52 when p >= 12 -> float64 frexp is exact; frexp's exponent
    # IS the bit length L (x = m * 2^L, 0.5 <= m < 1), so leading zeros in
    # the (64-p)-bit field = (64-p) - L and rho = (64-p) - L + 1
    rho[nz] = (64 - p) - np.frexp(rem[nz].astype(np.float64))[1] + 1
    rho[~nz] = (64 - p) + 1
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # small-range correction
    return est


def approx_distinct_words(sf_dir: str):
    """Approximate distinct-word count via a mergeable HyperLogLog sketch:
    each batch emits a constant-size (4 KiB) register array; the merge is an
    elementwise max over n_batches tiny summaries — the count never
    shuffles the word stream at all (the exact twin below does, and exists
    only to report the achieved error). Driver-visible verification row:
    (method, estimate, exact, rel_err); pytest asserts rel_err < 0.05."""
    ds = tbl(sf_dir, "documents", ["text"])

    def sketch(batch: pa.Table) -> pa.Table:
        flat = pc.unique(pc.list_flatten(pc.split_pattern(batch["text"], " ")))
        regs = _hll_registers(flat.to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    summaries = (ds.map_batches(sketch, batch_format="pyarrow").to_pandas())
    regs = np.zeros(1 << HLL_P, dtype=np.int8)
    for b in summaries["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
    estimate = _hll_estimate(regs)

    from ray.data.aggregate import Count

    def uniq(batch: pa.Table) -> pa.Table:
        w = pc.unique(pc.list_flatten(pc.split_pattern(batch["text"], " ")))
        return pa.table({"word": w})

    exact = (ds.map_batches(uniq, batch_format="pyarrow")
               .groupby("word").aggregate(Count(alias_name="c"))
               .count())
    rel_err = abs(estimate - exact) / max(exact, 1)
    return pd.DataFrame([{
        "method": f"hll_p{HLL_P}", "estimate": int(round(estimate)),
        "exact": int(exact), "rel_err": round(rel_err, 4),
    }])


def export_split_shards(sf_dir: str, out_dir: str | None = None):
    """Materialize the deterministic train/val/test assignment as a
    hive-partitioned parquet layout (``split=train/source=web/…``) — the
    training-shard export stage. Because membership is a pure row function
    (the same LCG as split_assign), a re-run regenerates identical shard
    CONTENTS on any cluster size — the property that makes partition-level
    resume sound (diff existing `split=/source=` dirs and write only the
    missing ones; this demo clears and rewrites the whole layout since the
    fixture is small). Downstream loaders read one split with a partition
    filter instead of a scan. Returns per-(split, source) char sums read
    BACK from the written layout, so the oracle check verifies the
    write→read round trip end to end."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import ray

    if out_dir is None:
        out_dir = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                               "split_shards")
    ds = tbl(sf_dir, "documents",
             ["doc_id", "source", "text", "n_chars"])

    def assign(batch: pa.Table) -> pa.Table:
        hi = _lcg_u64(batch["doc_id"].to_numpy()) >> np.uint64(32)
        split = np.where(hi < TRAIN_HI, "train",
                         np.where(hi < VAL_HI, "val", "test"))
        return batch.append_column("split", pa.array(split, pa.string()))

    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.map_batches(assign, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=["split", "source"])

    back = (ray.data.read_parquet(out_dir)
            .groupby(["split", "source"])
            .aggregate(Sum("n_chars", alias_name="sum_chars"))
            .to_pandas())
    back["sum_chars"] = back["sum_chars"].astype("int64")
    back["split"] = back["split"].astype(str)
    back["source"] = back["source"].astype(str)
    return back.sort_values(["split", "source"]).reset_index(drop=True)


SQL["export_split_shards"] = f"""
WITH h AS (
  SELECT source, n_chars, ({_HASH_SQL} // 4294967296) AS hi
  FROM documents)
SELECT CASE WHEN hi < {TRAIN_HI} THEN 'train'
            WHEN hi < {VAL_HI} THEN 'val' ELSE 'test' END AS split,
       source, sum(n_chars)::BIGINT AS sum_chars
FROM h GROUP BY split, source ORDER BY split, source
"""


def quantiles_by_source(sf_dir: str, ps: list[float] = QUANTILE_PS):
    """Per-source EXACT quantiles via the same mergeable value-histogram as
    quantiles_exact — keys are (source, distinct value), bounded by value
    cardinality x sources, so the column itself never shuffles and the
    driver walks |sources| tiny cumsums. The per-source length/quality
    percentile table every mixture decision starts from."""
    ds = tbl(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch["source"],
            "v": pc.cast(batch["n_chars"], pa.int64()),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        g = t.group_by(["source", "v"]).aggregate([("one", "sum")])
        return pa.table({"source": g["source"], "v": g["v"],
                         "cnt": g["one_sum"]})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "v"])
              .aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    rows = []
    for source, g in hist.groupby("source"):
        g = g.sort_values("v")
        cum = g["cnt"].astype("int64").cumsum().to_numpy()
        vals = g["v"].astype("int64").to_numpy()
        n = int(cum[-1])
        for p in ps:
            idx = int(np.searchsorted(cum, math.ceil(p * n), side="left"))
            rows.append({"source": source, "p": p, "value": int(vals[idx])})
    out = pd.DataFrame(rows)
    return out.sort_values(["source", "p"]).reset_index(drop=True)


SQL["quantiles_by_source"] = ("SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT source, {p} AS p, quantile_disc(n_chars, {p})::BIGINT"
        " AS value FROM documents GROUP BY source" for p in QUANTILE_PS)
    + ") ORDER BY source, p")
