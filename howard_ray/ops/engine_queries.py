"""Engine correctness as ORACLE-CHECKED queries: encode a real test table
through the columnar engine, decode it, and aggregate the DECODED rows —
the oracle runs the same aggregate on the ORIGINAL table in DuckDB, so any
codec/block/footer corruption breaks the value-hash equality.

This extends the pytest bit-identical gate (tests/) with a driver-visible
proof that the engine round-trips arbitrary tables (strings, ints, floats,
timestamps → int/str/list and 'other' codec kinds), not just the tokens
corpus.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import ray.data
from ray.data.aggregate import Count, Sum

from ..pipeline import decode_store, encode_dataset

SQL: dict[str, str] = {}

CACHE = os.path.join(tempfile.gettempdir(), "howard_ray_cache")


def _encode_decode(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    src = os.path.join(sf_dir, f"{table}.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_{table}_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="stream", target_rows=20_000,
                   resume=False, columns=columns)
    return decode_store(store)


def roundtrip_documents(sf_dir: str):
    """documents → encode (dict/fsst/plain_str + int codecs) → decode →
    per-lang aggregate of the decoded rows."""
    ds = _encode_decode(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = (ds.groupby("lang")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("n_chars", alias_name="sum_chars"),
                        Sum("doc_id", alias_name="sum_ids"))
             .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL["roundtrip_documents"] = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT)  AS sum_ids
FROM documents GROUP BY lang ORDER BY lang
"""


def roundtrip_lineitem(sf_dir: str):
    """lineitem (float64 money columns → 'float' codec kind: plain or
    byte-stream-split planes) → encode → decode → grouped money aggregate
    of the decoded rows."""
    ds = _encode_decode(sf_dir, "lineitem",
                        ["l_orderkey", "l_returnflag", "l_quantity",
                         "l_extendedprice"])
    out = (ds.groupby("l_returnflag")
             .aggregate(Count(alias_name="n"),
                        Sum("l_quantity", alias_name="sum_qty"),
                        Sum("l_extendedprice", alias_name="sum_price"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_price"] = out["sum_price"].round(2)
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL["roundtrip_lineitem"] = """
SELECT l_returnflag, count(*) AS n,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def store_append(sf_dir: str):
    """Incremental-ingest round trip: documents arrive as two deliveries
    (split on doc_id parity). Delivery 1 is encoded into a fresh store;
    delivery 2 is APPENDED as a new epoch (prior blocks untouched, union
    footer atomically swapped); the store is then COMPACTED (tail-merge)
    and decoded. The per-source aggregate of the decoded union must match
    the oracle's aggregate over the whole documents table — one value-hash
    ties append + epoch namespacing + compaction + decode together."""
    from ..pipeline import append_to_store, compact_store

    cols = ["doc_id", "source", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d1 = os.path.join(CACHE, f"delivery1_{tag}")
    d2 = os.path.join(CACHE, f"delivery2_{tag}")
    store = os.path.join(CACHE, f"store_append_{tag}")
    for p in (d1, d2, store):
        shutil.rmtree(p, ignore_errors=True)
    def parity(rem: int):
        def f(batch):
            import pyarrow.compute as _pc
            return batch.filter(_pc.equal(
                _pc.bit_wise_and(batch["doc_id"], 1), rem))
        return f

    ds = ray.data.read_parquet(src, columns=cols)
    ds.map_batches(parity(0), batch_format="pyarrow").write_parquet(d1)
    ds.map_batches(parity(1), batch_format="pyarrow").write_parquet(d2)

    f1 = encode_dataset(d1, store, mode="cluster", target_rows=20_000,
                        resume=False)
    f2 = append_to_store(store, d2, mode="cluster", target_rows=20_000)
    assert f2["append_epoch"] == 1 and f2["n_rows"] > f1["n_rows"]
    compact_store(store, target_rows=20_000)

    out = (decode_store(store)
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_chars", alias_name="sum_chars"),
                      Sum("doc_id", alias_name="sum_ids"))
           .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["store_append"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT)  AS sum_ids
FROM documents GROUP BY source ORDER BY source
"""


def store_delete(sf_dir: str):
    """Row-level delete round trip: documents encoded, rows with
    lang='fr' tombstone-deleted (blocks immutable, zone-pruned scan),
    decoded BOTH before purge (lazy tombstone apply) and after
    :func:`purge_deletes` (physical rewrite) — the two aggregates must be
    identical to each other and to the oracle's ``WHERE lang != 'fr'``."""
    from ..pipeline import delete_where, purge_deletes

    cols = ["doc_id", "source", "lang", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_delete_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False, columns=cols)
    delete_where(store, ("lang", "==", "fr"))

    def agg():
        out = (decode_store(store)
               .groupby("source")
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_chars", alias_name="sum_chars"),
                          Sum("doc_id", alias_name="sum_ids"))
               .to_pandas())
        for c in ["n_docs", "sum_chars", "sum_ids"]:
            out[c] = out[c].astype("int64")
        return out.sort_values("source").reset_index(drop=True)

    lazy = agg()
    purge_deletes(store)
    physical = agg()
    assert lazy.equals(physical), "purge changed the logical content"
    return physical


SQL["store_delete"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT)  AS sum_ids
FROM documents WHERE lang != 'fr'
GROUP BY source ORDER BY source
"""


def roundtrip_embeddings(sf_dir: str):
    """embeddings (embedding: list<float> → 'list_float' kind, bss_float
    byte-stream-split value codec) → encode → decode → per-label aggregate
    of the decoded rows. Exact-int aggregates only (floats never enter the
    oracle hash); the float payload itself is covered bit-identically by
    tests/test_codecs.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _encode_decode(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def add_dim(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_dim", pc.list_value_length(batch["embedding"]).cast(pa.int64()))

    out = (ds.map_batches(add_dim, batch_format="pyarrow")
             .groupby("label")
             .aggregate(Count(alias_name="n_vecs"),
                        Sum("vec_id", alias_name="sum_ids"),
                        Sum("n_dim", alias_name="sum_dims"))
             .to_pandas())
    for c in ["n_vecs", "sum_ids", "sum_dims"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


SQL["roundtrip_embeddings"] = """
SELECT label, count(*) AS n_vecs,
       CAST(sum(vec_id) AS BIGINT) AS sum_ids,
       CAST(sum(len(embedding)) AS BIGINT) AS sum_dims
FROM embeddings GROUP BY label ORDER BY label
"""


def pushdown_filter_decode(sf_dir: str):
    """Predicate pushdown INTO the encoded store (the reference's
    WHERE-into-the-scan, howard/objects/variants.py:6290-6306): decode
    documents with ``predicate=("lang", "==", "en")`` — footer zone maps
    skip non-matching blocks, surviving blocks decode ONLY the lang column
    until the row mask proves a match (late materialization) — then
    aggregate the decoded rows. Oracle = the same WHERE on the original."""
    from ..pipeline import decode_store

    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_pushdown_{tag}")
    # ALWAYS re-encode (like every other roundtrip query here): a cached
    # store would let the gate decode bytes written by an older encoder,
    # silently un-covering the current encode path
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="stream", target_rows=20_000,
                   resume=False, columns=["doc_id", "lang", "n_chars"])
    ds = decode_store(store, predicate=("lang", "==", "en"))
    out = (ds.groupby("lang")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("n_chars", alias_name="sum_chars"),
                        Sum("doc_id", alias_name="sum_ids"))
             .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL["pushdown_filter_decode"] = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT)  AS sum_ids
FROM documents WHERE lang = 'en' GROUP BY lang
"""


def running_total(sf_dir: str):
    """Per-user running cumulative sum over the ordered event log — the
    stream-shaped stateful aggregate (ray_guide streaming pattern: partition
    by key, sort by ts within group, sequential state inside map_groups)."""
    import pandas as pd

    from .util import buckets_for_table, tbl

    ds = tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = buckets_for_table(sf_dir, "events",
                           ["event_id", "user_id", "ts", "value"])

    def add_bucket(batch):
        # bounded bucket key (user count scales); grouped cumsum inside the
        # bucket is one vectorized pass over all of its users. Arrow-native
        # full-data pass — no pandas detour on the hot path; bucket count
        # derives from the pruned events size (round-5 item #1)
        import numpy as _np
        import pyarrow as _pa
        b = (batch["user_id"].to_numpy() * _np.int64(2654435761)) % nb
        return batch.append_column("b", _pa.array(b))

    def per_bucket(g) -> "pa.Table":
        # Arrow/numpy segment fold (round-4): cumsum minus user-segment
        # baseline — no pandas conversion per bucket
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.compute as _pc
        uid = g["user_id"].to_numpy()
        ts = _pc.cast(g["ts"], _pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = _np.lexsort((eid, ts, uid))
        u, e, v = uid[order], eid[order], val[order]
        n = len(u)
        start = _np.ones(n, dtype=bool)
        start[1:] = u[1:] != u[:-1]
        seg_start = _np.flatnonzero(start)[_np.cumsum(start) - 1]
        cs = _np.cumsum(v)
        run = cs - (cs - v)[seg_start]
        return _pa.table({"event_id": _pa.array(e),
                          "running_value": _pa.array(_np.round(run, 2))})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("b").map_groups(per_bucket, batch_format="pyarrow")
             .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


SQL["running_total"] = """
SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events ORDER BY event_id
"""


def roundtrip_pruned(sf_dir: str):
    """Zone-map-pruned decode (the engine's index path, driver-visible):
    encode lineitem sorted by quantity band so blocks have tight l_quantity
    zone maps, then decode with ``zone_filter={"l_quantity": (40, None)}``
    and column pruning — only blocks whose [min,max] intersects [40, inf)
    are ever read — and aggregate the survivors with an EXACT row filter on
    top (zone maps prune blocks, the residual predicate prunes rows). The
    oracle runs the same filtered aggregate on the original table, so a
    wrong zone map (over-pruning) breaks the value-hash equality."""
    import pandas as pd
    import pyarrow as pa

    src = os.path.join(sf_dir, "lineitem.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_pruned_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    # sort by quantity before encoding so zone maps are selective (the
    # engine's sorted+indexed output shape; footer keeps block order)
    srt = os.path.join(CACHE, f"lineitem_sorted_{tag}")
    shutil.rmtree(srt, ignore_errors=True)
    (ray.data.read_parquet(src, columns=["l_orderkey", "l_quantity"])
        .sort("l_quantity").write_parquet(srt))
    encode_dataset(srt, store, mode="stream", target_rows=20_000, resume=False)
    ds = decode_store(store, zone_filter={"l_quantity": (40, None)})

    def residual(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater_equal(batch["l_quantity"], 40))

    out = (ds.map_batches(residual, batch_format="pyarrow")
             .groupby("l_quantity")
             .aggregate(Count(alias_name="n"),
                        Sum("l_orderkey", alias_name="sum_keys"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["sum_keys"] = out["sum_keys"].astype("int64")
    out["l_quantity"] = out["l_quantity"].round(2)
    return out.sort_values("l_quantity").reset_index(drop=True)


SQL["roundtrip_pruned"] = """
SELECT round(l_quantity, 2) AS l_quantity, count(*) AS n,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_keys
FROM lineitem WHERE l_quantity >= 40
GROUP BY l_quantity ORDER BY l_quantity
"""


def _chars_bucket_fn(t):
    """Derived column: n_chars // 100 (module-level so ray.put ships it)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    return pc.divide(pc.cast(t["n_chars"], pa.int64()),
                     pa.scalar(100, type=pa.int64()))


def store_derive(sf_dir: str):
    """Schema-evolution round trip: documents encoded, a DERIVED column
    (``chars_c = n_chars // 100``) added via :func:`derive_column` — no base
    block is rewritten; each block gets a single-column encoded sidecar with
    its own codec + zone-map stats — then decoded WITH A PUSHDOWN PREDICATE
    ON THE DERIVED COLUMN (``chars_c >= 3``: footer zone maps prune blocks
    on sidecar stats, the sidecar alone is decoded for the row mask, base
    columns late-materialize). Aggregate of the surviving rows must match
    the oracle computing the same expression + WHERE on the original
    table — one value-hash covering derive, sidecar encode/decode, derived
    zone maps, and mixed base+sidecar reads."""
    from ..pipeline import derive_column

    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_derive_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="stream", target_rows=20_000,
                   resume=False, columns=["doc_id", "lang", "n_chars"])
    res = derive_column(store, "chars_c", _chars_bucket_fn, ["n_chars"])
    assert res["n_blocks_derived"] > 0 and res["ext_bytes"] > 0

    ds = decode_store(store, columns=["doc_id", "lang", "chars_c"],
                      predicate=("chars_c", ">=", 3))
    out = (ds.groupby("lang")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("doc_id", alias_name="sum_ids"),
                        Sum("chars_c", alias_name="sum_buckets"))
             .to_pandas())
    for c in ["n_docs", "sum_ids", "sum_buckets"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL["store_derive"] = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(sum(n_chars // 100) AS BIGINT) AS sum_buckets
FROM documents WHERE n_chars // 100 >= 3
GROUP BY lang ORDER BY lang
"""


def store_time_travel(sf_dir: str):
    """Snapshot time travel: documents arrive as two deliveries (doc_id
    parity). Delivery 1's footer swap archives snapshot A; the append of
    delivery 2 archives snapshot B. Decoding ``as_of=A`` must see EXACTLY
    the first delivery (block files are immutable; the snapshot footer is
    pure metadata), while the live decode sees the union. Both aggregates
    are emitted tagged and checked against one SQL twin — a single
    value-hash covering snapshot archival, as_of planning, and the
    immutability of already-written blocks across an append."""
    from ..pipeline import append_to_store

    cols = ["doc_id", "lang", "source", "n_chars"]  # cluster mode groups by source
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d1 = os.path.join(CACHE, f"tt_delivery1_{tag}")
    d2 = os.path.join(CACHE, f"tt_delivery2_{tag}")
    store = os.path.join(CACHE, f"store_tt_{tag}")
    for p in (d1, d2, store):
        shutil.rmtree(p, ignore_errors=True)

    def parity(rem: int):
        def f(batch):
            import pyarrow.compute as _pc
            return batch.filter(_pc.equal(
                _pc.bit_wise_and(batch["doc_id"], 1), rem))
        return f

    ds = ray.data.read_parquet(src, columns=cols)
    ds.map_batches(parity(0), batch_format="pyarrow").write_parquet(d1)
    ds.map_batches(parity(1), batch_format="pyarrow").write_parquet(d2)

    f1 = encode_dataset(d1, store, mode="cluster", target_rows=20_000,
                        resume=False)
    snap_a = f1["snapshot_id"]
    f2 = append_to_store(store, d2, mode="cluster", target_rows=20_000)
    assert f2["snapshot_id"] > snap_a

    def agg(ds_, label):
        out = (ds_.groupby("lang")
                  .aggregate(Count(alias_name="n_docs"),
                             Sum("doc_id", alias_name="sum_ids"))
                  .to_pandas())
        out["snap"] = label
        for c in ["n_docs", "sum_ids"]:
            out[c] = out[c].astype("int64")
        return out

    import pandas as pd
    out = pd.concat([agg(decode_store(store, as_of=snap_a), "as_of_even"),
                     agg(decode_store(store), "current")])
    return (out[["snap", "lang", "n_docs", "sum_ids"]]
            .sort_values(["snap", "lang"]).reset_index(drop=True))


SQL["store_time_travel"] = """
SELECT 'as_of_even' AS snap, lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
UNION ALL
SELECT 'current' AS snap, lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents GROUP BY lang
ORDER BY snap, lang
"""


def store_alter(sf_dir: str):
    """Metadata-only schema evolution round trip: documents encoded, then
    ``alter_store`` RENAMES n_chars→chars and DROPS source — a pure footer
    swap, zero block files touched — and the store is decoded WITH A
    PUSHDOWN PREDICATE ON THE RENAMED COLUMN (zone maps were re-keyed to
    the logical name, so block pruning and the single-column late-
    materialized decode run untranslated). The per-lang aggregate of the
    surviving rows must match the oracle computing the same filter on the
    original table — one value-hash covering rename maps, drops, re-keyed
    zone maps, and the renamed pushdown path."""
    from ..pipeline import alter_store

    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_alter_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False, columns=["doc_id", "lang", "source",
                                          "n_chars"])
    r = alter_store(store, rename={"n_chars": "chars"}, drop=["source"])
    assert r["renamed"] == 1 and r["dropped"] == 1

    ds = decode_store(store, predicate=("chars", ">=", 500))
    out = (ds.groupby("lang")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("doc_id", alias_name="sum_ids"),
                        Sum("chars", alias_name="sum_chars"))
             .to_pandas())
    for c in ["n_docs", "sum_ids", "sum_chars"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL["store_alter"] = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE n_chars >= 500
GROUP BY lang ORDER BY lang
"""


def store_lookup(sf_dir: str):
    """Bloom point-lookup round trip: documents encoded CLUSTERED BY SOURCE
    (so every block's doc_id zone map spans the whole domain — min/max
    pruning is useless for a doc_id point probe), then a per-block Bloom
    index is built over doc_id and the store is decoded with
    ``doc_id IN (...)``. Each decode task consults the block's Bloom
    sidecar FIRST and skips definite-miss blocks without decoding even the
    predicate column. The returned rows must match the oracle's WHERE
    doc_id IN — one value-hash covering filter construction, probe-side
    hashing symmetry, and the skip path returning no false negatives."""
    from ..pipeline import build_bloom_index

    ids = [3, 77, 142, 256, 498]  # present at every sf (doc_id 0..N-1)
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_lookup_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False, columns=["doc_id", "lang", "source",
                                          "n_chars"])
    r = build_bloom_index(store, "doc_id")
    assert r["n_blocks_indexed"] > 0

    out = (decode_store(store, predicate=("doc_id", "in", ids))
           .to_pandas())
    for c in ["doc_id", "n_chars"]:
        out[c] = out[c].astype("int64")
    return (out[["doc_id", "lang", "source", "n_chars"]]
            .sort_values("doc_id").reset_index(drop=True))


SQL["store_lookup"] = """
SELECT doc_id, lang, source, n_chars
FROM documents WHERE doc_id IN (3, 77, 142, 256, 498)
ORDER BY doc_id
"""


def store_upsert(sf_dir: str):
    """MERGE round trip: the whole documents table is encoded, then a CDC
    delta (every doc_id % 10 == 0 row, with n_chars bumped by 1,000,000)
    is UPSERTED — same-key rows tombstone-deleted, the delta appended as a
    fresh epoch, all composed from the two crash-safe primitives. The
    decoded per-source aggregate must equal the oracle computing the
    post-merge value with a CASE expression over the original table — one
    value-hash covering key collection, the broadcast tombstone scan, the
    epoch append, and the lazy delete apply at decode."""
    from ..pipeline import upsert_to_store

    cols = ["doc_id", "lang", "source", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    delta = os.path.join(CACHE, f"upsert_delta_{tag}")
    store = os.path.join(CACHE, f"store_upsert_{tag}")
    for p in (delta, store):
        shutil.rmtree(p, ignore_errors=True)

    def bump(batch):
        import pyarrow as _pa
        import pyarrow.compute as _pc
        b = batch.filter(_pc.equal(
            _pc.subtract(batch["doc_id"],
                         _pc.multiply(_pc.divide(batch["doc_id"], 10),
                                      10)), 0))
        i = b.column_names.index("n_chars")
        return b.set_column(i, "n_chars",
                            _pc.add(b["n_chars"], _pa.scalar(1_000_000)))

    ray.data.read_parquet(src, columns=cols) \
        .map_batches(bump, batch_format="pyarrow").write_parquet(delta)

    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False, columns=cols)
    r = upsert_to_store(store, delta, key="doc_id", target_rows=20_000)
    assert r["n_replaced"] == r["n_keys"] and r["n_inserted"] == 0

    out = (decode_store(store)
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_chars", alias_name="sum_chars"),
                      Sum("doc_id", alias_name="sum_ids"))
           .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["store_upsert"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000000
                     ELSE n_chars END) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents GROUP BY source ORDER BY source
"""


def store_changes(sf_dir: str):
    """Incremental change-feed round trip: delivery 1 (even doc_ids) is
    encoded — its footer snapshot is the consumer's baseline — then
    delivery 2 (odd doc_ids) is appended as a new epoch.
    :func:`read_changes` from the baseline snapshot must decode EXACTLY
    delivery 2 (live blocks minus snapshot blocks, block-parallel), so the
    per-source aggregate of the feed equals the oracle's aggregate over
    the odd half of documents — a consumer reprocesses only the delta."""
    from ..manifest import load_footer
    from ..pipeline import append_to_store, read_changes

    cols = ["doc_id", "source", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d1 = os.path.join(CACHE, f"cdc1_{tag}")
    d2 = os.path.join(CACHE, f"cdc2_{tag}")
    store = os.path.join(CACHE, f"store_cdc_{tag}")
    for p in (d1, d2, store):
        shutil.rmtree(p, ignore_errors=True)

    def parity(rem: int):
        def f(batch):
            import pyarrow.compute as _pc
            return batch.filter(_pc.equal(
                _pc.bit_wise_and(batch["doc_id"], 1), rem))
        return f

    ds = ray.data.read_parquet(src, columns=cols)
    ds.map_batches(parity(0), batch_format="pyarrow").write_parquet(d1)
    ds.map_batches(parity(1), batch_format="pyarrow").write_parquet(d2)

    encode_dataset(d1, store, mode="cluster", target_rows=20_000,
                   resume=False)
    baseline = load_footer(store)["snapshot_id"]
    append_to_store(store, d2, mode="cluster", target_rows=20_000)

    out = (read_changes(store, baseline)
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_chars", alias_name="sum_chars"),
                      Sum("doc_id", alias_name="sum_ids"))
           .to_pandas())
    for c in ["n_docs", "sum_chars", "sum_ids"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["store_changes"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT)  AS sum_ids
FROM documents WHERE doc_id % 2 = 1 GROUP BY source ORDER BY source
"""


def store_recluster(sf_dir: str):
    """OPTIMIZE round trip: documents are encoded source-clustered, then
    physically RE-SORTED by n_chars (:func:`recluster_store` — one
    range-partitioned sort, streaming re-encode, atomic swap). The n_chars
    zone maps become tight disjoint ranges, so the filtered aggregate
    below decodes only the straddling block(s); its value-hash equality
    with the oracle proves the rewrite lost and duplicated nothing."""
    from ..pipeline import recluster_store

    cols = ["doc_id", "source", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE, f"store_rcl_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False, columns=cols)
    recluster_store(store, "n_chars", target_rows=20_000)

    from ..sqlmini import run_sql
    out = run_sql(store, "SELECT COUNT(*) AS n_docs, "
                         "SUM(n_chars) AS sum_chars, SUM(doc_id) AS sum_ids "
                         "FROM store WHERE n_chars >= 400")
    return out


SQL["store_recluster"] = """
SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE n_chars >= 400
"""


def store_view(sf_dir: str):
    """Incrementally-maintained materialized view (howard_ray.view): the
    even-doc_id delivery is encoded and a per-source COUNT/SUM/MIN/MAX/AVG
    view is materialized; the odd delivery is appended and
    :func:`refresh_view` folds ONLY the new epoch's blocks (the change
    feed) into the stored mergeable state — no rescan of the base. The
    value-hash equality with a full GROUP BY over the whole documents
    table proves the incremental merge law (count/sum add, min/max
    combine, avg = mergeable (sum, count) pair) is exact."""
    from ..pipeline import append_to_store
    from ..view import create_view, read_view, refresh_view

    cols = ["doc_id", "source", "n_chars"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d1 = os.path.join(CACHE, f"view_d1_{tag}")
    d2 = os.path.join(CACHE, f"view_d2_{tag}")
    store = os.path.join(CACHE, f"store_view_{tag}")
    view = os.path.join(CACHE, f"view_{tag}")
    for p in (d1, d2, store, view):
        shutil.rmtree(p, ignore_errors=True)

    def parity(rem: int):
        def f(batch):
            import pyarrow.compute as _pc
            return batch.filter(_pc.equal(
                _pc.bit_wise_and(batch["doc_id"], 1), rem))
        return f

    ds = ray.data.read_parquet(src, columns=cols)
    ds.map_batches(parity(0), batch_format="pyarrow").write_parquet(d1)
    ds.map_batches(parity(1), batch_format="pyarrow").write_parquet(d2)

    encode_dataset(d1, store, mode="cluster", target_rows=20_000,
                   resume=False)
    create_view(store, view, ["source"],
                {"n_docs": ("count",), "sum_chars": ("sum", "n_chars"),
                 "min_chars": ("min", "n_chars"),
                 "max_chars": ("max", "n_chars"),
                 "avg_chars": ("avg", "n_chars")})
    append_to_store(store, d2, mode="cluster", target_rows=20_000)
    r = refresh_view(view)
    assert r["mode"] == "incremental", r
    out = read_view(view)
    for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
        out[c] = out[c].astype("int64")
    out["avg_chars"] = out["avg_chars"].astype("float64").round(4)
    return out


SQL["store_view"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       ROUND(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY source ORDER BY source
"""


def store_schema_evolution(sf_dir: str):
    """Schema evolution on append: delivery 1 (even doc_ids) is encoded
    WITHOUT the lang column; delivery 2 (odd doc_ids) appends WITH it.
    Blocks predating the column decode it as typed nulls (donor-header
    type probe), so the union store groups by source with COUNT(lang)
    counting exactly the post-epoch rows — value-hash-equal to the
    oracle's CASE-gated count over the whole documents table."""
    from ray.data.aggregate import Count, Sum

    cols = ["doc_id", "source", "n_chars", "lang"]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d1 = os.path.join(CACHE, f"sev_d1_{tag}")
    d2 = os.path.join(CACHE, f"sev_d2_{tag}")
    store = os.path.join(CACHE, f"store_sev_{tag}")
    for p in (d1, d2, store):
        shutil.rmtree(p, ignore_errors=True)

    def parity(rem: int, keep_lang: bool):
        def f(batch):
            import pyarrow.compute as _pc
            b = batch.filter(_pc.equal(
                _pc.bit_wise_and(batch["doc_id"], 1), rem))
            return b if keep_lang else b.drop_columns(["lang"])
        return f

    ds = ray.data.read_parquet(src, columns=cols)
    ds.map_batches(parity(0, False), batch_format="pyarrow").write_parquet(d1)
    ds.map_batches(parity(1, True), batch_format="pyarrow").write_parquet(d2)

    from ..pipeline import append_to_store
    encode_dataset(d1, store, mode="cluster", target_rows=20_000,
                   resume=False)
    append_to_store(store, d2, mode="cluster", target_rows=20_000)

    out = (decode_store(store)
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Count(on="lang", ignore_nulls=True,
                            alias_name="n_lang"),
                      Sum("n_chars", alias_name="sum_chars"))
           .to_pandas())
    for c in ("n_docs", "n_lang", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["store_schema_evolution"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lang,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source ORDER BY source
"""


def join_spj(sf_dir: str):
    """Storage-partitioned join (howard_ray.spj): documents and embeddings
    are encoded into two stores and RECLUSTERED on the join key, then
    joined with ZERO shuffle — the block-pair plan comes from the two
    footers' zone maps alone, each surviving A block decodes itself plus
    only the B blocks its key range intersects, and the per-pair Arrow
    hash join runs block-parallel. The per-source aggregate of the joined
    rows is value-hash-checked against the same JOIN in DuckDB."""
    from ray.data.aggregate import Count, Sum

    from ..pipeline import recluster_store
    from ..spj import join_clustered

    tag = os.path.basename(os.path.normpath(sf_dir))
    sa = os.path.join(CACHE, f"spj_docs_{tag}")
    sb = os.path.join(CACHE, f"spj_embs_{tag}")
    for p in (sa, sb):
        shutil.rmtree(p, ignore_errors=True)
    encode_dataset(os.path.join(sf_dir, "documents.parquet"), sa,
                   mode="stream", target_rows=20_000, resume=False,
                   columns=["doc_id", "source", "n_chars"])
    encode_dataset(os.path.join(sf_dir, "embeddings.parquet"), sb,
                   mode="stream", target_rows=20_000, resume=False,
                   columns=["vec_id", "label"])
    recluster_store(sa, "doc_id", target_rows=20_000)
    recluster_store(sb, "vec_id", target_rows=20_000)

    ds = join_clustered(sa, sb, "doc_id", "vec_id",
                        columns_a=["source", "n_chars"],
                        columns_b=["label"])
    out = (ds.groupby("source")
           .aggregate(Count(alias_name="n"),
                      Sum("n_chars", alias_name="sum_chars"),
                      Sum("label", alias_name="sum_label"))
           .to_pandas())
    for c in ("n", "sum_chars", "sum_label"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["join_spj"] = """
SELECT source, count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(label) AS BIGINT) AS sum_label
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY source ORDER BY source
"""


def store_token_lookup(sf_dir: str):
    """Token-presence skipping index over the north-star tokens corpus
    (rows-only: the synthesized corpus is not an oracle view): the corpus
    encodes into a store, ``build_bloom_index(store, "tokens")`` builds
    per-block Blooms over each block's DISTINCT token ids, and a
    ``("tokens", "contains", id)`` decode predicate finds every sequence
    containing the probe token — zone maps prune blocks whose value range
    excludes it (the per-source vocabulary caps make this real), the
    Bloom kills definite-miss blocks before any decode, and the
    membership mask is one flatten + searchsorted (no per-row loop).
    Self-checked: the emitted count equals a brute-force numpy scan of
    the raw corpus."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..fixtures import write_corpus
    from ..pipeline import build_bloom_index, decode_store

    tag = os.path.basename(os.path.normpath(sf_dir))
    sf = {"sf0.001": 600, "sf0.01": 6000, "sf0.1": 60000}.get(tag, 3000)
    src = os.path.join(CACHE, f"toklk_corpus_{sf}.parquet")
    if not os.path.exists(src):
        write_corpus(src, sf, seed=42)
    store = os.path.join(CACHE, f"store_toklk_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", resume=False,
                   target_rows=max(1000, sf // 8))
    build_bloom_index(store, "tokens")

    probe = 45_123  # above most sources' vocab caps: zone maps prune
    got = decode_store(store, columns=["doc_id", "n_tok"],
                       predicate=("tokens", "contains", probe)).to_pandas()

    t = pq.read_table(src, columns=["tokens"])
    arr = t["tokens"].combine_chunks()
    flat = np.asarray(arr.flatten())
    lengths = np.asarray(pc.list_value_length(arr), dtype=np.int64)
    rows = np.unique(np.searchsorted(np.cumsum(lengths),
                                     np.nonzero(flat == probe)[0],
                                     side="right"))
    assert len(got) == len(rows), (len(got), len(rows))
    import pandas as pd
    return pd.DataFrame({"probe_token": [probe],
                         "n_sequences": [len(got)],
                         "sum_n_tok": [int(got["n_tok"].sum())
                                       if len(got) else 0]})
