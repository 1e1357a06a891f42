"""SQL query surface demos (reference ``howard query``,
howard/tools/query.py:22-74): each entry is ONE SQL string executed by BOTH
engines — howard_ray.sqlmini compiles it to a Ray Data plan; the driver's
oracle runs the very same text in DuckDB. One string, two engines,
value-hash-equal results.
"""

from __future__ import annotations

from ..sqlmini import run_sql

SQL: dict[str, str] = {}

_QUERIES = {
    "sql_grouped_filter": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_quantity), 2) AS sum_qty, ROUND(AVG(l_extendedprice), 4) AS avg_price
FROM lineitem WHERE l_quantity >= 25 GROUP BY l_returnflag
ORDER BY l_returnflag""",
    "sql_like_filter": """SELECT p_brand, COUNT(*) AS n,
ROUND(MIN(p_retailprice), 2) AS min_price, ROUND(MAX(p_retailprice), 2) AS max_price
FROM part WHERE p_type LIKE '%DARD%' GROUP BY p_brand ORDER BY p_brand""",
    "sql_global_agg": """SELECT COUNT(*) AS n_orders,
ROUND(SUM(o_totalprice), 2) AS total, ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "sql_projection": """SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice >= 450000 ORDER BY o_orderkey""",
    "sql_select_star": """SELECT * FROM nation WHERE n_regionkey <= 2
ORDER BY n_nationkey""",
    "sql_having": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_extendedprice), 2) AS rev FROM lineitem
GROUP BY l_returnflag HAVING n >= 10000 ORDER BY l_returnflag""",
    "sql_count_distinct": """SELECT o_orderpriority,
COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_order_by_alias": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
GROUP BY o_orderpriority ORDER BY rev DESC, o_orderpriority LIMIT 3""",
    "sql_in_filter": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
AND o_totalprice >= 1000
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_join_dim": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_totalprice >= 1000
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_join_chain": """SELECT n_name, COUNT(*) AS n_cust,
ROUND(SUM(c_acctbal), 2) AS bal FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""",
    # boolean WHERE grammar: OR / parentheses / BETWEEN compiled to DNF,
    # evaluated as one vectorized Kleene-OR of per-branch AND masks
    "sql_where_or": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
WHERE o_totalprice >= 400000 OR o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_between": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(AVG(l_quantity), 4) AS avg_qty FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
GROUP BY l_returnflag ORDER BY l_returnflag""",
    "sql_or_and_mix": """SELECT COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '5-LOW')
AND (o_totalprice BETWEEN 100000 AND 200000 OR o_totalprice > 400000)""",
    "sql_having_or": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
GROUP BY o_orderpriority HAVING n >= 300 OR rev < 40000000
ORDER BY o_orderpriority""",
    # NOT resolved at parse time by operator negation + De Morgan —
    # the executor only ever sees positive DNF
    "sql_not": """SELECT COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
WHERE NOT (o_orderpriority = '1-URGENT' OR o_totalprice > 400000)""",
    "sql_not_in_like": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_quantity), 2) AS qty FROM lineitem
WHERE l_linestatus NOT IN ('F') AND l_returnflag NOT LIKE 'A%'
AND l_quantity NOT BETWEEN 20 AND 40
GROUP BY l_returnflag ORDER BY l_returnflag""",
    # SELECT DISTINCT ≡ hidden grouped COUNT, dropped before output
    "sql_distinct": """SELECT DISTINCT lang, source FROM documents
ORDER BY lang, source""",
    # scalar arithmetic expressions (TPC-H Q1 shape): compiled to one
    # vectorized pyarrow.compute map_batches stage, then aggregated as
    # ordinary columns; ROUND matches DuckDB's half-away-from-zero on the
    # scaled double (_sql_round), not numpy's half-to-even
    "sql_expr_q1": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
ROUND(AVG(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS charge
FROM lineitem WHERE l_quantity >= 25
GROUP BY l_returnflag ORDER BY l_returnflag""",
    # plain projection expression with SQL float division; the /1000 lands
    # 2-decimal money values on exact scaled .5 ties, so this hash also
    # proves the DuckDB-compatible tie-break in _sql_round
    "sql_expr_project": """SELECT o_orderkey,
ROUND(o_totalprice / 1000, 4) AS kprice FROM orders
WHERE o_totalprice >= 450000 ORDER BY o_orderkey""",
    # typed temporal literals: TIMESTAMP '...' / DATE '...' parse to
    # datetimes compared natively against timestamp columns by Arrow,
    # while DuckDB runs the same text
    "sql_date_filter": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
WHERE o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31'
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # CASE WHEN inside aggregates (TPC-H Q12 shape): the WHEN condition
    # grammar (comparisons, AND/OR/NOT, LIKE) evaluates as Kleene masks
    # and the arms fold into one vectorized if_else chain; float literals
    # keep the two engines' SUM dtypes aligned (DuckDB widens SUM over
    # INTEGER to HUGEINT, which pandas renders as float)
    "sql_case_when": """SELECT l_linestatus,
ROUND(SUM(CASE WHEN l_quantity > 30 THEN 1.0 ELSE 0.0 END), 2) AS n_big,
ROUND(SUM(CASE WHEN l_quantity <= 30 AND l_returnflag <> 'R'
THEN l_extendedprice END), 2) AS small_rev
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    # string-valued CASE as a GROUP BY key (grouped via its alias — the
    # materialized expression column is the shuffle key)
    "sql_case_bucket": """SELECT CASE WHEN n_chars > 2000 THEN 'long'
WHEN n_chars > 500 THEN 'mid' ELSE 'short' END AS bucket,
COUNT(*) AS n, ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY bucket ORDER BY bucket""",
    # post-aggregation expression (TPC-H Q14 shape): each aggregate call
    # becomes a hidden grouped aggregate; the residual ratio arithmetic is
    # evaluated on the small result frame with the same Arrow kernels
    "sql_postagg_ratio": """SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
THEN p_retailprice ELSE 0.0 END) / SUM(p_retailprice) * 100, 4) AS promo_pct
FROM part""",
    # per-group ratio of two independent aggregates
    "sql_postagg_grouped": """SELECT l_returnflag,
ROUND(SUM(l_extendedprice) / COUNT(*), 4) AS avg_rev,
ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 2) AS price_span
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # scalar function library (pyarrow.compute kernels): string functions
    # as GROUP BY keys via materialized aliases, ABS/inner-ROUND inside
    # aggregate arguments, COALESCE over a no-ELSE CASE's NULL arm
    "sql_scalar_fns": """SELECT UPPER(SUBSTR(p_type, 1, 5)) AS t5,
COUNT(*) AS n, ROUND(SUM(ABS(p_retailprice - 1000.0)), 2) AS dev,
ROUND(SUM(COALESCE(CASE WHEN p_size > 25 THEN p_retailprice END, 0.0)), 2)
AS big_rev FROM part GROUP BY t5 ORDER BY t5""",
    "sql_length_floor": """SELECT FLOOR(LENGTH(text) / 400) AS len_bucket,
COUNT(*) AS n, ROUND(AVG(n_chars), 4) AS avg_chars FROM documents
GROUP BY len_bucket ORDER BY len_bucket""",
    # expression WHERE (function calls / arithmetic comparisons fall back
    # from the DNF parser to one vectorized Kleene mask, no pruning)
    "sql_expr_where": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net
FROM lineitem WHERE l_extendedprice * (1 - l_discount) > 50000
AND LENGTH(l_returnflag) = 1 GROUP BY l_returnflag ORDER BY l_returnflag""",
    # expression HAVING with raw aggregates not in the SELECT list —
    # lowered to hidden aggregate items via the postagg accumulator
    "sql_having_raw_agg": """SELECT o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
HAVING MAX(o_totalprice) > 400000 AND SUM(o_totalprice) / COUNT(*) > 100000
ORDER BY o_orderpriority""",
    # LEFT JOIN: unmatched fact rows survive NULL-padded (COUNT(col)
    # skips them); the dim-side WHERE condition applies POST-join so the
    # NULL-padded rows it must drop are visible to it, as in SQL
    "sql_left_join": """SELECT c_mktsegment, COUNT(*) AS n_rows,
COUNT(o_orderkey) AS n_orders, ROUND(SUM(o_totalprice), 2) AS rev
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # expression ORDER BY: raw aggregates / ratios as sort keys lower to
    # hidden items, sorted on then dropped before output
    "sql_order_by_expr": """SELECT o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
ORDER BY SUM(o_totalprice) / COUNT(*) DESC, o_orderpriority LIMIT 4""",
    # window functions (round 3): ONE bucketed shuffle on the shared
    # PARTITION BY key, per-bucket vectorized pandas window pass —
    # ROW_NUMBER / LAG / running SUM with DuckDB's RANGE-peer frame
    "sql_window_rownum": """SELECT event_id,
ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events ORDER BY event_id""",
    "sql_window_lag": """SELECT event_id,
LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt2
FROM events ORDER BY event_id""",
    "sql_window_running": """SELECT event_id,
ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS run_v,
COUNT(*) OVER (PARTITION BY user_id) AS n_events
FROM events WHERE value >= 5 ORDER BY event_id""",
    "sql_window_rank": """SELECT o_orderkey,
RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS r,
MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS top_p
FROM orders WHERE o_totalprice >= 400000 ORDER BY o_orderkey""",
    # WITH clause (round 3): materialized CTE composition — each CTE runs
    # through the full compiler and later levels reference it like a base
    # table (CTE names shadow base tables, SQL scoping)
    "sql_with_cte": """WITH big AS (SELECT o_custkey, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
GROUP BY o_custkey HAVING n >= 8)
SELECT c_mktsegment, COUNT(*) AS n_cust, ROUND(SUM(rev), 2) AS seg_rev
FROM big JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "sql_with_chain": """WITH a AS (SELECT l_returnflag, l_linestatus,
COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty FROM lineitem
GROUP BY l_returnflag, l_linestatus),
b AS (SELECT l_returnflag, COUNT(*) AS n_status, ROUND(SUM(qty), 2) AS tot
FROM a GROUP BY l_returnflag)
SELECT l_returnflag, n_status, tot FROM b ORDER BY l_returnflag""",
    # UNION [ALL] (round 3): top-level split + composition; the trailing
    # ORDER BY/LIMIT belongs to the whole union, UNION dedups
    "sql_union_all": """SELECT 'high' AS band, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders WHERE o_totalprice >= 300000
UNION ALL SELECT 'low' AS band, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders WHERE o_totalprice < 300000
ORDER BY band""",
    "sql_union_distinct": """SELECT o_orderpriority AS k FROM orders
WHERE o_totalprice >= 480000
UNION SELECT o_orderpriority AS k FROM orders
WHERE o_orderpriority = '1-URGENT' ORDER BY k""",
    # derived table (round 3): FROM (SELECT …) alias rides the CTE path
    "sql_derived_table": """SELECT c_mktsegment, COUNT(*) AS n_cust,
ROUND(SUM(rev), 2) AS seg_rev FROM (SELECT o_custkey,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders GROUP BY o_custkey) r
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
}


def _mk(sql: str):
    def q(sf_dir: str):
        return run_sql(sf_dir, sql)
    return q


QUERIES = {name: _mk(sql) for name, sql in _QUERIES.items()}
SQL.update(_QUERIES)


_STORE_SQL = """SELECT lang, COUNT(*) AS n_docs,
ROUND(SUM(n_chars), 2) AS sum_chars, COUNT(DISTINCT source) AS n_sources
FROM store WHERE n_chars >= 300 GROUP BY lang ORDER BY lang"""


def sql_over_store(sf_dir: str):
    """Mini-SQL DIRECTLY over an encoded store: documents are encoded into
    the flagship cluster store, then the same SQL text runs on BOTH engines
    — sqlmini compiles ``FROM store`` to decode_store (pruned columns +
    the n_chars predicate pushed into the block scan: zone maps prune,
    the predicate column decodes first, the rest late-materializes) while
    the oracle runs it on the original documents table. One value-hash
    covering the SQL surface composed with the encoded-store scan path."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sql_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False,
                   columns=["doc_id", "lang", "source", "n_chars"])
    out = run_sql(store, _STORE_SQL)
    out["sum_chars"] = out["sum_chars"].astype("float64")
    return out


QUERIES["sql_over_store"] = sql_over_store
SQL["sql_over_store"] = _STORE_SQL.replace("FROM store", "FROM documents")


_META_SQL = """SELECT COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars,
MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
ROUND(AVG(n_chars), 4) AS avg_chars FROM store"""


def sql_store_metadata(sf_dir: str):
    """O(metadata) SQL over the encoded store: a pure COUNT/SUM/MIN/MAX/AVG
    SELECT is answered from the footer zone-map stats with ZERO block
    decodes (sqlmini._store_metadata_answer) — the lakehouse
    column-statistics read at SQL level; a 100-TB store serves this from
    its footer alone. The oracle runs the same text over the raw documents
    table, so the hash also proves the footer sums are exact."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqlmeta_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="stream", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    out = run_sql(store, _META_SQL)
    out["sum_chars"] = out["sum_chars"].astype("float64")
    return out


QUERIES["sql_store_metadata"] = sql_store_metadata
SQL["sql_store_metadata"] = _META_SQL.replace("FROM store", "FROM documents")


_PUSH_SQL = """SELECT COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars,
MIN(n_chars) AS min_chars, ROUND(AVG(n_chars), 4) AS avg_chars
FROM store WHERE source = 'src7' AND n_chars >= 300"""


def sql_store_pushdown_agg(sf_dir: str):
    """Zone-complete aggregate pushdown through SQL: the WHERE-filtered
    aggregate classifies every block against the conjuncts via footer
    min/max — on this source-clustered store the source='src7' conjunct is
    block-exact, so only blocks the n_chars range straddles are decoded;
    all-match blocks contribute their footer sums without being read
    (sqlmini._store_pushdown_aggregate)."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqlpush_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    out = run_sql(store, _PUSH_SQL)
    out["sum_chars"] = out["sum_chars"].astype("float64")
    return out


QUERIES["sql_store_pushdown_agg"] = sql_store_pushdown_agg
SQL["sql_store_pushdown_agg"] = _PUSH_SQL.replace("FROM store",
                                                  "FROM documents")


_STORE_JOIN_SQL = """SELECT c_mktsegment, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM store
JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice >= 1000 AND c_acctbal >= 0
GROUP BY c_mktsegment ORDER BY c_mktsegment"""


def sql_store_join(sf_dir: str):
    """Encoded store as the streaming FACT side of a star join: orders are
    encoded into a store, then ``FROM store JOIN customer`` runs the
    zone-pruned predicate-pushed block scan as the probe stream against
    the broadcast customer dim (each WHERE condition pushed into its
    owning side before the join). The oracle runs the same text with the
    raw orders table substituted for the store."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "orders.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqljoin_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="stream", resume=False,
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = run_sql(store, _STORE_JOIN_SQL, tables_dir=sf_dir)
    return out


QUERIES["sql_store_join"] = sql_store_join
SQL["sql_store_join"] = _STORE_JOIN_SQL.replace("FROM store", "FROM orders")


_GROUP_META_SQL = """SELECT source, COUNT(*) AS n_docs,
SUM(n_chars) AS sum_chars, ROUND(AVG(n_chars), 4) AS avg_chars
FROM store GROUP BY source ORDER BY source"""


def sql_store_group_metadata(sf_dir: str):
    """Grouped O(metadata) SQL: the cluster store's (source, salt) blocks
    are single-valued in ``source`` (footer min == max), so GROUP BY
    source folds per-group COUNT/SUM/AVG from the footer stats without
    reading any block (sqlmini._store_grouped_metadata_answer); only
    blocks straddling group values would decode."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqlgmeta_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    out = run_sql(store, _GROUP_META_SQL)
    out["sum_chars"] = out["sum_chars"].astype("float64")
    return out


QUERIES["sql_store_group_metadata"] = sql_store_group_metadata
SQL["sql_store_group_metadata"] = _GROUP_META_SQL.replace("FROM store",
                                                          "FROM documents")


_TOPK_SQL = """SELECT doc_id, n_chars, source FROM store
WHERE source = 'src3' ORDER BY n_chars DESC, doc_id LIMIT 25"""


def sql_store_topk(sf_dir: str):
    """ORDER BY + LIMIT over a store CLUSTERED on the order key
    (sqlmini._store_order_limit_scan): after ``recluster_store(st,
    'n_chars')`` the blocks are near-disjoint n_chars ranges, so the
    top-k scan decodes blocks greedily in footer-stat key order and stops
    as soon as ``LIMIT`` rows provably precede every undecoded block — a
    LIMIT-25 over a clustered 100-TB store touches O(1) blocks instead of
    sorting the table. The oracle runs the same text over the raw
    documents table; equality also proves the greedy stop bound is sound
    (ties included: the bound is strict)."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset, recluster_store

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqltopk_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    recluster_store(store, "n_chars")
    return run_sql(store, _TOPK_SQL)


QUERIES["sql_store_topk"] = sql_store_topk
SQL["sql_store_topk"] = _TOPK_SQL.replace("FROM store", "FROM documents")


_STORE_OR_SQL = """SELECT lang, COUNT(*) AS n_docs,
SUM(n_chars) AS sum_chars FROM store
WHERE source = 'src1' OR source = 'src4' AND n_chars BETWEEN 200 AND 900
GROUP BY lang ORDER BY lang"""


def sql_store_or(sf_dir: str):
    """Boolean (DNF) WHERE directly over the encoded store: the cluster
    store is partitioned by source, so union-of-branches zone pruning
    (sqlmini._or_zone_block_ids) decodes only the two sources' blocks —
    every other block is pruned from footer stats alone — and the residual
    Kleene-OR mask reproduces DuckDB's NULL semantics exactly. The SQL
    text deliberately mixes OR/AND precedence (AND binds tighter) so the
    value-hash also proves the parser's grammar matches DuckDB's."""
    import os
    import shutil
    import tempfile

    from ..pipeline import encode_dataset

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(cache, f"store_sqlor_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(src, store, mode="cluster", target_rows=20_000,
                   resume=False,
                   columns=["doc_id", "lang", "source", "n_chars"])
    out = run_sql(store, _STORE_OR_SQL)
    out["sum_chars"] = out["sum_chars"].astype("float64")
    return out


QUERIES["sql_store_or"] = sql_store_or
SQL["sql_store_or"] = _STORE_OR_SQL.replace("FROM store", "FROM documents")
