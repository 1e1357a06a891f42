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
    "sql_having": """SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_extendedprice), 2) AS rev FROM lineitem
GROUP BY l_returnflag HAVING n >= 10000 ORDER BY l_returnflag""",
    "sql_count_distinct": """SELECT o_orderpriority,
COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_order_by_alias": """SELECT o_orderpriority, COUNT(*) AS n,
ROUND(SUM(o_totalprice), 2) AS rev FROM orders
GROUP BY o_orderpriority ORDER BY rev DESC, o_orderpriority LIMIT 3""",
}


def _mk(sql: str):
    def q(sf_dir: str):
        return run_sql(sf_dir, sql)
    return q


QUERIES = {name: _mk(sql) for name, sql in _QUERIES.items()}
SQL.update(_QUERIES)
