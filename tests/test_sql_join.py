"""Mini-SQL JOIN surface: star-schema broadcast joins compiled to
per-batch Arrow acero hash joins, equal to DuckDB on the same SQL text."""

import duckdb
import pandas as pd
import pytest

from howard_ray.sqlmini import parse, run_sql

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _check(con, sql):
    out = run_sql(SF, sql).reset_index(drop=True)
    ref = con.sql(sql).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype(ref.dtypes.to_dict()), ref)


def test_join_grouped_two_sided_where(ray_session, con):
    _check(con, "SELECT o_orderpriority, COUNT(*) AS n, "
                "ROUND(SUM(o_totalprice), 2) AS rev FROM orders "
                "JOIN customer ON o_custkey = c_custkey "
                "WHERE c_mktsegment = 'BUILDING' AND o_totalprice >= 1000 "
                "GROUP BY o_orderpriority ORDER BY o_orderpriority")


def test_join_chain_three_tables(ray_session, con):
    _check(con, "SELECT n_name, COUNT(*) AS n_cust, "
                "ROUND(SUM(c_acctbal), 2) AS bal FROM customer "
                "JOIN nation ON c_nationkey = n_nationkey "
                "JOIN region ON n_regionkey = r_regionkey "
                "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name")


def test_join_plain_select_order_limit(ray_session, con):
    _check(con, "SELECT o_orderkey, o_totalprice, c_name FROM orders "
                "JOIN customer ON o_custkey = c_custkey "
                "WHERE o_totalprice >= 400000 "
                "ORDER BY o_totalprice DESC LIMIT 5")


def test_join_parse_and_errors(ray_session):
    p = parse("SELECT a, COUNT(*) AS n FROM t JOIN u ON a = b "
              "JOIN v ON c = d GROUP BY a")
    assert p["table"] == "t"
    assert p["joins"] == [
        {"table": "u", "a": "a", "b": "b", "how": "inner"},
        {"table": "v", "a": "c", "b": "d", "how": "inner"}]
    # disconnected join key (references neither side built so far)
    with pytest.raises(ValueError):
        run_sql(SF, "SELECT COUNT(*) AS n FROM orders "
                    "JOIN nation ON r_regionkey = n_regionkey")
    # FROM store JOIN without tables_dir is rejected, not silently wrong
    with pytest.raises(ValueError):
        run_sql(SF, "SELECT COUNT(*) AS n FROM store "
                    "JOIN customer ON o_custkey = c_custkey")


def test_join_from_store(ray_session, tmp_path):
    """Encoded store as the fact side: FROM store JOIN dim matches DuckDB
    on raw orders⋈customer; requires tables_dir for the dims."""
    from howard_ray.pipeline import encode_dataset

    st = str(tmp_path / "st_orders")
    encode_dataset(f"{SF}/orders.parquet", st, mode="stream",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    sql = ("SELECT c_mktsegment, COUNT(*) AS n, "
           "ROUND(SUM(o_totalprice), 2) AS rev FROM store "
           "JOIN customer ON o_custkey = c_custkey "
           "WHERE o_totalprice >= 1000 AND c_acctbal >= 0 "
           "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    out = run_sql(st, sql, tables_dir=SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    ref = con.sql(sql.replace("FROM store", "FROM orders")).df()
    pd.testing.assert_frame_equal(out.astype(ref.dtypes.to_dict()), ref)
    with pytest.raises(ValueError):
        run_sql(st, sql)  # no tables_dir: dims unresolvable


# ------------------------------------------------------------ LEFT JOIN

LEFT_CASES = [
    # unmatched left rows survive NULL-padded; COUNT(col) skips them
    ("SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS "
     "n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
     "GROUP BY c_mktsegment ORDER BY c_mktsegment",
     ("customer", "orders")),
    # LEFT OUTER spelling; SUM over the NULL-padded measure
    ("SELECT c_nationkey, ROUND(SUM(o_totalprice), 2) AS rev FROM customer "
     "LEFT OUTER JOIN orders ON c_custkey = o_custkey GROUP BY c_nationkey "
     "ORDER BY c_nationkey LIMIT 6", ("customer", "orders")),
    # WHERE on the left-joined dim filters AFTER the join (SQL WHERE sees
    # the NULL-padded rows) — pre-filtering the dim would keep unmatched
    # left rows the condition must drop
    ("SELECT c_mktsegment, COUNT(*) AS n FROM customer LEFT JOIN orders "
     "ON c_custkey = o_custkey WHERE o_totalprice > 200000 "
     "GROUP BY c_mktsegment ORDER BY c_mktsegment", ("customer", "orders")),
    # inner-then-left chain
    ("SELECT n_name, COUNT(o_orderkey) AS n_orders FROM customer "
     "JOIN nation ON c_nationkey = n_nationkey LEFT JOIN orders "
     "ON c_custkey = o_custkey GROUP BY n_name ORDER BY n_name LIMIT 6",
     ("customer", "nation", "orders")),
    # fact-side WHERE still pushes pre-join
    ("SELECT c_mktsegment, COUNT(o_orderkey) AS n FROM customer "
     "LEFT JOIN orders ON c_custkey = o_custkey WHERE c_acctbal > 5000 "
     "GROUP BY c_mktsegment ORDER BY c_mktsegment", ("customer", "orders")),
]


@pytest.mark.parametrize("sql,tables", LEFT_CASES)
def test_left_join_matches_duckdb(ray_session, con, sql, tables):
    _check(con, sql)
