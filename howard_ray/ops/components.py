"""Duplicate-cluster resolution: distributed connected components over the
verified near-dup pair set, and the end-to-end dedup pipeline it enables
(pairs → clusters → one survivor per cluster → cleaned corpus).

This closes the dedup family: LSH/Jaccard stages emit PAIRS, but a real
training-data pipeline must then decide which DOCUMENTS to drop — and
near-dup relations are not transitive-closed (A~B, B~C without A~C), so
pair-wise dropping is ill-defined until pairs are resolved into connected
components. The reference has no analog (variant keys are unique,
SURVEY.md §2.12); this is a training-data extension.

Algorithm: iterative hash-min label propagation, the standard
vertex-centric connected-components formulation (Kang et al., HCC /
Pregel-style). Each node starts labeled with its own id; every round each
node takes the min label over itself and its neighbors — expressed
entirely as Ray Data ops (one hash join + one grouped min per round), so
every round is a bounded shuffle of the (node, label) table and NOTHING
grows with cluster count on the driver. Convergence in O(diameter) rounds;
near-dup clusters are dense (diameter 1-3 in practice), and the label sum
is monotone decreasing so a fixpoint is detected exactly by comparing two
tiny scalars. The oracle is a recursive-CTE transitive closure over the
same edge set.

Scale note: at 10^12 rows the edge set is O(N) and the label table is
bounded by the number of docs that appear in at least one near-dup pair;
both stay distributed end-to-end. For adversarially long chains the
O(log n) star-contraction variant would replace the per-round join, with
the same Dataset shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from .dedup import _JACCARD_SQL, jaccard_pairs_ds
from .util import derive_buckets, parquet_rows, tbl

SQL: dict[str, str] = {}

_MAX_ROUNDS = 25


def _cc_labels(edges: ray.data.Dataset,
               n_buckets: int | None = None) -> ray.data.Dataset:
    """(node, rep) for every node in ``edges`` (columns doc_a, doc_b);
    rep = min doc_id reachable via undirected edges. ``n_buckets`` bounds
    the per-round merge fold's task input to O((|edges|+|labels|)/n);
    callers size it from their corpus (round-5 item #1) — the default
    derives only a parallelism floor (edge count is unknown pre-exec)."""
    if n_buckets is None:
        n_buckets = derive_buckets(0)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow")

    # initial labels: label(u) = min neighbor-or-self — fold round 1 into
    # the init by taking min(u, v) per u (one grouped aggregate)
    def self_and_neighbor(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        return pa.table({"node": pa.array(u),
                         "label": pa.array(np.minimum(u, v))})

    labels = (sym.map_batches(self_and_neighbor, batch_format="pyarrow")
                 .groupby("node").aggregate(Min("label", alias_name="label")))

    # Per-round edge⋈label lookup as a BUCKETED MERGE (union on a shared
    # bucket key + one vectorized pandas merge per bucket) instead of
    # ``Dataset.join``: Ray's hash-join operator emits ZERO-COLUMN blocks
    # for empty output partitions, map functions are never invoked on
    # empty blocks (so no downstream map can repair them), and a second
    # join fed such blocks dies in Arrow ("no match for FieldRef on right
    # side"). The bucketed merge is join-free, tolerates schemaless empty
    # blocks (groupby drops them), and is the same co-shuffle shape the
    # dedup family already uses for pair aggregation.

    def tag_edges(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        return pa.table({"b": pa.array(v % n_buckets),
                         "u": pa.array(u), "key": pa.array(v),
                         "label": pa.array(np.full(len(u), -1,
                                                   dtype=np.int64)),
                         "side": pa.array(np.zeros(len(u), dtype=np.int8))})

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        lab = batch["label"].to_numpy()
        return pa.table({"b": pa.array(node % n_buckets),
                         "u": pa.array(np.full(len(node), -1,
                                               dtype=np.int64)),
                         "key": pa.array(node), "label": pa.array(lab),
                         "side": pa.array(np.ones(len(node), dtype=np.int8))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["side"] == 1]
        edg = g[g["side"] == 0]
        m = edg[["u", "key"]].merge(
            lab[["key", "label"]], on="key", how="inner")
        # candidates: each node's own label (lab rows) + every neighbor's
        # label routed back to u (merged rows)
        return pd.DataFrame({
            "node": np.concatenate([m["u"].to_numpy(),
                                    lab["key"].to_numpy()]).astype("int64"),
            "label": np.concatenate([m["label"].to_numpy(),
                                     lab["label"].to_numpy()]).astype("int64"),
        })

    tagged_edges = sym.map_batches(tag_edges, batch_format="pyarrow")

    def label_sum(ds: ray.data.Dataset) -> int:
        s = ds.aggregate(Sum("label", alias_name="s"))
        return int(s["s"])

    prev = label_sum(labels)
    for _ in range(_MAX_ROUNDS):
        # one bucketed co-shuffle + one grouped min per round, all on the
        # bounded (node,label) table
        tagged_labels = labels.map_batches(tag_labels, batch_format="pyarrow")
        labels = (tagged_edges.union(tagged_labels)
                              .groupby("b")
                              .map_groups(merge, batch_format="pandas")
                              .groupby("node")
                              .aggregate(Min("label", alias_name="label")))
        # pin this round's labels in the object store (blocks stay
        # distributed) so each round's lineage doesn't re-execute all
        # previous rounds' joins
        labels = labels.materialize()
        cur = label_sum(labels)
        if cur == prev:   # labels only decrease; equal sum == fixpoint
            break
        prev = cur
    return labels


def dedup_components(sf_dir: str):
    """Resolve the verified Jaccard near-dup pairs into connected
    components: one row per document that appears in any pair, with
    ``rep`` = the component representative (min doc_id reachable)."""
    nb = derive_buckets(parquet_rows(sf_dir, "documents") * 48)
    labels = _cc_labels(jaccard_pairs_ds(sf_dir), n_buckets=nb)
    out = labels.to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rep": pd.Series([], dtype="int64")})
    out = pd.DataFrame({"doc_id": out["node"].astype("int64"),
                        "rep": out["label"].astype("int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


# transitive closure over the same edge set (pairs CTE = the exact
# shingle-Jaccard join SQL); min reachable id per node = the component rep
_CC_CORE = f"""
pairs AS ({_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
cc(node, reach) AS (
  SELECT u AS node, u AS reach FROM edges
  UNION
  SELECT cc.node, e.v AS reach FROM cc JOIN edges e ON e.u = cc.reach
),
comp AS (
  SELECT node, min(reach) AS rep FROM cc GROUP BY node
)
"""

SQL["dedup_components"] = f"""
WITH RECURSIVE {_CC_CORE}
SELECT node AS doc_id, rep FROM comp ORDER BY doc_id
"""


def dedup_survivors(sf_dir: str):
    """End-to-end near-dup dedup: keep exactly one document (the min
    doc_id) per duplicate component, report the surviving corpus per
    source. The drop set is applied with a hash-partitioned LEFT OUTER
    join (documents ⋈ drops), not a broadcast — at 10^12 rows the drop
    set is O(dup fraction × N) and must stay distributed."""
    labels = _cc_labels(
        jaccard_pairs_ds(sf_dir),
        n_buckets=derive_buckets(parquet_rows(sf_dir, "documents") * 48))

    # anti-join documents ⋉̸ drops as a bucketed co-shuffle (same join-free
    # discipline as _cc_labels — Ray's native join chokes on the schemaless
    # empty blocks an empty/skewed drop set produces). Both sides land in
    # the same doc_id-keyed bucket; the per-bucket kernel subtracts the
    # drop set vectorized and pre-aggregates per source, so only
    # (source, partial) rows leave the stage. Bucket count derives from
    # the co-shuffled row volume (~48 B per doc/drop row).
    n_buckets = derive_buckets(parquet_rows(sf_dir, "documents") * 48)

    def tag_docs(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        return pa.table({"b": pa.array(did % n_buckets),
                         "doc_id": pa.array(did),
                         "source": batch["source"],
                         "n_chars": pc.cast(batch["n_chars"], pa.int64()),
                         "side": pa.array(np.zeros(len(did), dtype=np.int8))})

    def tag_drops(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        lab = batch["label"].to_numpy()
        d = node[node != lab]
        return pa.table({"b": pa.array(d % n_buckets),
                         "doc_id": pa.array(d),
                         "source": pa.array([""] * len(d), type=pa.string()),
                         "n_chars": pa.array(np.zeros(len(d),
                                                      dtype=np.int64)),
                         "side": pa.array(np.ones(len(d), dtype=np.int8))})

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        docs_g = g[g["side"] == 0]
        drop_ids = g.loc[g["side"] == 1, "doc_id"]
        kept = docs_g[~docs_g["doc_id"].isin(drop_ids)]
        out = kept.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        return out[["source", "n_docs", "sum_chars"]]

    docs = (tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"])
            .map_batches(tag_docs, batch_format="pyarrow"))
    drops = labels.map_batches(tag_drops, batch_format="pyarrow")
    out = (docs.union(drops)
               .groupby("b")
               .map_groups(survivors, batch_format="pandas")
               .groupby("source")
               .aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("sum_chars", alias_name="sum_chars"))
               .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["dedup_survivors"] = f"""
WITH RECURSIVE {_CC_CORE}
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node != rep)
GROUP BY source ORDER BY source
"""
