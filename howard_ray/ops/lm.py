"""Bigram language-model training + perplexity scoring — the
model-train-then-batch-inference shape of a training-data pipeline
(quality-filter LMs like KenLM gates), end-to-end on Ray Data with an
EXACT DuckDB twin.

Pipeline:
  1. TRAIN distributed: per-batch vectorized bigram explode → partial
     (w1, w2) counts → one small groupby merge. The unigram context counts
     and the add-one-smoothing denominator derive from the bigram table on
     the driver (vocab-bounded, tiny here).
  2. BROADCAST the model once (``ray.put``); each scoring task reads it
     zero-copy (broadcast-small-side discipline).
  3. SCORE per doc in ``map_batches``: explode bigrams, one vectorized
     pandas merge against the model, per-doc mean log-prob via
     ``np.bincount``, perplexity = exp(-mean); per-source partial sums.
  4. One bounded-key groupby finishes avg perplexity per source.

Scale note: at web scale the vocabulary no longer fits one worker — the
broadcast in step 2 becomes a shuffle join of the exploded bigrams against
the sharded count table (same keys, same math); the train step is already
the scale shape (partial counts before the exchange).

Reference parity: the reference's stateful scorer is the FASTA-backed HGVS
actor (howard/objects/variants.py:7821-8202); this is the same
load-once/score-batches discipline over an LM instead of a genome index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Sum

from .util import tbl

SQL: dict[str, str] = {}


def _bigrams(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized bigram explode: (w1, w2, row_index) over the whole batch;
    docs with < 2 words contribute nothing."""
    words = batch["text"].str.split(" ")
    lens = words.str.len().to_numpy(np.int64)
    if not len(batch):
        e = np.array([], dtype=object)
        return e, e, np.array([], dtype=np.int64)
    flat = np.concatenate(words.to_numpy())
    row = np.repeat(np.arange(len(batch)), lens)
    # a position starts a bigram iff the NEXT flat position is the same row
    starts = row[:-1] == row[1:]
    return flat[:-1][starts], flat[1:][starts], row[:-1][starts]


_LONE = "\x00lone"  # sentinel w2 for words with no following word


def train_bigram_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed bigram counts over the corpus: partial counts inside each
    batch, one (w1, w2)-keyed groupby merge. Besides true bigrams, each
    doc's FINAL word (and a 1-word doc's only word) is emitted as
    (word, sentinel) so the vocabulary — distinct(w1) over the result —
    falls out of the same single pass instead of a second corpus scan."""
    ds = tbl(sf_dir, "documents", ["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w1, w2, row = _bigrams(batch)
        words = batch["text"].str.split(" ")
        lens = words.str.len().to_numpy(np.int64)
        if len(batch):
            flat = np.concatenate(words.to_numpy())
            last = flat[np.cumsum(lens) - 1]  # final word of every doc
        else:
            last = np.array([], dtype=object)
        df = pd.DataFrame({
            "w1": np.concatenate([w1, last]),
            "w2": np.concatenate([w2, np.full(len(last), _LONE, object)]),
        })
        return (df.groupby(["w1", "w2"], as_index=False).size()
                  .rename(columns={"size": "c"}))

    # merge of BOUNDED summaries (each partial is <= |observed bigrams| of
    # its batch, capped by vocab^2, not by corpus size) — same driver-merge
    # class as the HLL registers / heavy-hitter candidate sets. When the
    # vocabulary itself outgrows one machine (true web-scale BPE-less text),
    # this one line becomes .groupby(["w1","w2"]).aggregate(Sum("c")) and
    # the scoring merge becomes a shuffle join (see module docstring).
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["w1", "w2"], as_index=False)["c"].sum()
    out["c"] = out["c"].astype("int64")
    return out


def lm_perplexity(sf_dir: str):
    """Per-source average bigram perplexity with add-one smoothing:
    P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Exact — the model trains on the
    full corpus on both engines, so the DuckDB twin reproduces every value."""
    raw = train_bigram_counts(sf_dir)
    # vocabulary: every word occurs as w1 at least once (each doc's last
    # word is emitted with the sentinel), so V = distinct(w1)
    v = raw["w1"].nunique()
    c2 = raw[raw["w2"] != _LONE]
    c1 = c2.groupby("w1", as_index=False)["c"].sum().rename(columns={"c": "c1"})
    model = c2.merge(c1, on="w1")
    model["lp"] = np.log((model["c"] + 1.0) / (model["c1"] + float(v)))
    model_ref = ray.put(model[["w1", "w2", "lp"]])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(model_ref)  # zero-copy plasma read per task
        w1, w2, row = _bigrams(batch)
        if not len(w1):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "ppl": pd.Series([], dtype="float64"),
                                 "one": pd.Series([], dtype="int64")})
        hits = (pd.DataFrame({"w1": w1, "w2": w2, "row": row})
                .merge(lm, on=["w1", "w2"], how="left"))
        # model trained on the same corpus → every scoring bigram is known
        lp_sum = np.bincount(hits["row"], weights=hits["lp"],
                             minlength=len(batch))
        n_bg = np.bincount(hits["row"], minlength=len(batch))
        has = n_bg > 0
        ppl = np.exp(-lp_sum[has] / n_bg[has])
        return pd.DataFrame({"source": batch["source"].to_numpy()[has],
                             "ppl": ppl,
                             "one": np.ones(int(has.sum()), dtype=np.int64)})

    out = (tbl(sf_dir, "documents", ["source", "text"])
           .map_batches(score, batch_format="pandas")
           .groupby("source")
           .aggregate(Sum("ppl", alias_name="s_ppl"),
                      Sum("one", alias_name="n_docs"))
           .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["avg_ppl"] = (out["s_ppl"] / out["n_docs"]).round(3)
    return (out[["source", "n_docs", "avg_ppl"]]
            .sort_values("source").reset_index(drop=True))


SQL["lm_perplexity"] = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, source,
         unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
  FROM words WHERE len(ws) >= 2),
bg2 AS (SELECT doc_id, source, z[1] AS w1, z[2] AS w2 FROM bg),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg2 GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c) AS c FROM c2 GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS n FROM
        (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
scored AS (
  SELECT bg2.doc_id, bg2.source,
         ln((c2.c + 1.0) / (c1.c + (SELECT n FROM v))) AS lp
  FROM bg2 JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
pp AS (SELECT doc_id, any_value(source) AS source, exp(-avg(lp)) AS ppl
       FROM scored GROUP BY doc_id)
SELECT source, count(*) AS n_docs, round(avg(ppl), 3) AS avg_ppl
FROM pp GROUP BY source ORDER BY source
"""
