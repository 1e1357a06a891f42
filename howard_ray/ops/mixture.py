"""Data-mixture curation operators: exact char-budget sampling per source
(the "give me X tokens of web, Y of books" stage every pretraining-data
pipeline runs) and sequence-length bucketing (the padding-efficiency
diagnostic behind batch-packing decisions).

The budget sampler is the scalable form of weighted reservoir selection:
selection order is a pure row hash (LCG over doc_id — deterministic on any
cluster size / resumed job), and the "take docs in hash order until the
budget is spent" prefix is found WITHOUT a global sort:

1. one map_batches pass emits per-(source, hash-bucket) char-sum partials
   (buckets = top 12 bits of the hash → a bounded #sources × 4096 table);
2. the driver folds that tiny table into a per-source cutoff bucket and
   the budget remaining within it (constant-size driver state);
3. a second pass keeps rows below the cutoff bucket outright and routes
   ONLY the threshold bucket's rows (expected |source|/4096) into a
   per-(source) ordered prefix scan.

So the full-corpus work is two streaming passes + one grouped shuffle of
~1/4096th of the data — no sort, no driver materialization. The SQL twin
is the literal spec: running char sum over hash order, QUALIFY run <=
budget. Reference parity: the reference samples previews via DuckDB
``USING SAMPLE`` (howard/objects/variants.py query paths); budgeted
mixture sampling is the training-data generalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from .sampling import _HASH_SQL, _lcg_u64
from .util import tbl

SQL: dict[str, str] = {}

# per-source share of that source's total chars to keep (mixture weights;
# unlisted sources fall back to DEFAULT_FRAC)
MIX_FRACS = {"web": 0.3, "books": 0.9, "code": 0.7, "news": 0.5,
             "wiki": 0.8}
DEFAULT_FRAC = 0.5
N_BUCKETS = 4096  # hash-bucket histogram resolution (top 12 bits)


def _frac_sql() -> str:
    cases = " ".join(f"WHEN source = '{s}' THEN {f}"
                     for s, f in sorted(MIX_FRACS.items()))
    return f"(CASE {cases} ELSE {DEFAULT_FRAC} END)"


def mixture_sample(sf_dir: str):
    """Exact per-source char-budget sample: keep docs in LCG-hash order
    until ``frac(source) * total_chars(source)`` is spent; report the
    selected per-source doc/char counts."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        h = _lcg_u64(batch["doc_id"].to_numpy())
        b = (h >> np.uint64(52)).astype(np.int64)   # top 12 bits
        t = pa.table({"source": batch["source"], "bucket": pa.array(b),
                      "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        g = t.group_by(["source", "bucket"]).aggregate([("n_chars", "sum")])
        return pa.table({"source": g["source"], "bucket": g["bucket"],
                         "chars": g["n_chars_sum"]})

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
              .groupby(["source", "bucket"])
              .aggregate(Sum("chars", alias_name="chars"))
              .to_pandas())                       # ≤ #sources × 4096 rows

    # driver fold (constant-size): per-source cutoff bucket + remainder.
    # Budget semantics match the SQL twin exactly: keep rows while the
    # running char sum over (hash, doc_id) order stays <= budget.
    cut: dict[str, tuple[int, int]] = {}   # source -> (cut_bucket, rem)
    for source, g in hist.groupby("source"):
        g = g.sort_values("bucket")
        total = int(g["chars"].sum())
        frac = MIX_FRACS.get(source, DEFAULT_FRAC)
        budget = int(np.floor(frac * total))
        run = g["chars"].cumsum()
        full = g[run <= budget]
        spent = int(full["chars"].sum())
        after = g[run > budget]
        if after.empty:                    # whole source fits the budget
            cut[source] = (N_BUCKETS, 0)
        else:
            cut[source] = (int(after.iloc[0]["bucket"]), budget - spent)

    import ray as _ray
    cut_ref = _ray.put(cut)

    def select(batch: pa.Table) -> pa.Table:
        c = _ray.get(cut_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = _lcg_u64(batch["doc_id"].to_numpy())
        b = (h >> np.uint64(52)).astype(np.int64)
        cuts = np.array([c.get(s, (N_BUCKETS, 0))[0] for s in src],
                        dtype=np.int64)
        chars = batch["n_chars"].to_numpy().astype(np.int64)
        below = b < cuts                       # definitely selected
        at = b == cuts                         # needs the exact prefix
        part = pa.table({
            "source": batch["source"],
            "status": pa.array(np.where(below, 0, np.where(at, 1, 2))
                               .astype(np.int8)),
            "doc_id": batch["doc_id"],
            "hash": pa.array(h.view(np.int64)),
            "n_chars": pa.array(chars),
        })
        # pre-aggregate the certain rows; ship threshold rows whole
        sel = part.filter(pc.equal(part["status"], 0))
        g = (pa.table({"source": sel["source"],
                       "one": pa.array(np.ones(sel.num_rows,
                                               dtype=np.int64)),
                       "n_chars": sel["n_chars"]})
             .group_by("source")
             .aggregate([("one", "sum"), ("n_chars", "sum")]))
        agg = pa.table({"source": g["source"], "doc_id":
                        pa.array(np.full(len(g), -1, dtype=np.int64)),
                        "hash": pa.array(np.zeros(len(g), dtype=np.int64)),
                        "n_docs": pc.cast(g["one_sum"], pa.int64()),
                        "n_chars": pc.cast(g["n_chars_sum"], pa.int64())})
        thr = part.filter(pc.equal(part["status"], 1))
        thr = pa.table({"source": thr["source"], "doc_id": thr["doc_id"],
                        "hash": thr["hash"],
                        "n_docs": pa.array(np.full(thr.num_rows, 0,
                                                   dtype=np.int64)),
                        "n_chars": thr["n_chars"]})
        return pa.concat_tables([agg, thr])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        source = g["source"].iloc[0]
        _, rem = cut.get(source, (N_BUCKETS, 0))
        certain = g[g["doc_id"] == -1]
        n_docs = int(certain["n_docs"].sum())
        n_chars = int(certain["n_chars"].sum())
        thr = g[g["doc_id"] != -1]
        if not thr.empty and rem > 0:
            # exact ordered prefix inside the single threshold bucket:
            # unsigned hash order (hashes ride as int64 bit views), then
            # doc_id to break ties — identical to the SQL ORDER BY
            thr = thr.assign(
                uh=thr["hash"].to_numpy().view(np.uint64)).sort_values(
                ["uh", "doc_id"])
            run = thr["n_chars"].cumsum()
            keep = thr[run <= rem]
            n_docs += len(keep)
            n_chars += int(keep["n_chars"].sum())
        return pd.DataFrame({"source": [source], "n_docs": [n_docs],
                             "sel_chars": [n_chars]})

    out = (ds.map_batches(select, batch_format="pyarrow")
             .groupby("source")
             .map_groups(per_source, batch_format="pandas")
             .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sel_chars"] = out["sel_chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["mixture_sample"] = f"""
WITH h AS (
  SELECT source, doc_id, n_chars, {_HASH_SQL} AS hv FROM documents
), b AS (
  SELECT source,
         floor({_frac_sql()} * sum(n_chars))::BIGINT AS budget
  FROM documents GROUP BY source
), r AS (
  SELECT h.source, h.n_chars, b.budget,
         sum(h.n_chars) OVER (PARTITION BY h.source
                              ORDER BY h.hv, h.doc_id) AS run
  FROM h JOIN b USING (source)
)
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sel_chars
FROM r WHERE run <= budget GROUP BY source ORDER BY source
"""


def length_buckets(sf_dir: str):
    """Per-(source, floor(log2(n_chars))) doc count + char mass — the
    length histogram that sizes packing batches and exposes padding
    waste. One partial-aggregate pass, bounded key space."""
    ds = tbl(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["n_chars"], 0))
        n = batch["n_chars"].to_numpy().astype(np.int64)
        lb = np.floor(np.log2(n)).astype(np.int64)
        t = pa.table({"source": batch["source"], "len_bucket":
                      pa.array(lb),
                      "one": pa.array(np.ones(len(n), dtype=np.int64)),
                      "n_chars": pa.array(n)})
        g = t.group_by(["source", "len_bucket"]).aggregate(
            [("one", "sum"), ("n_chars", "sum")])
        return pa.table({"source": g["source"],
                         "len_bucket": g["len_bucket"],
                         "n_docs": g["one_sum"],
                         "sum_chars": g["n_chars_sum"]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "len_bucket"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_chars", alias_name="sum_chars"))
             .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return (out.sort_values(["source", "len_bucket"])
               .reset_index(drop=True))


SQL["length_buckets"] = """
SELECT source, floor(log2(n_chars))::BIGINT AS len_bucket,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents WHERE n_chars > 0
GROUP BY source, len_bucket ORDER BY source, len_bucket
"""
