"""Scalar arithmetic expressions in mini-SQL (TPC-H Q1 shape), typed
DATE/TIMESTAMP literals, and DuckDB-compatible ROUND (half away from zero
on the scaled double, where numpy/pandas round half to even)."""

import duckdb
import pandas as pd
import pytest

from howard_ray.sqlmini import (_eval_expr, _parse_expr, _sql_round,
                                explain_sql, parse, run_sql)

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, *tables: str):
    for t in tables:
        sql = sql.replace(f"FROM {t}", f"FROM '{SF}/{t}.parquet' {t}")
        sql = sql.replace(f"JOIN {t}", f"JOIN '{SF}/{t}.parquet' {t}")
    return duckdb.sql(sql).df()


# -------------------------------------------------------------- parser

def test_expr_parser_precedence_and_paren():
    # 1 + 2 * 3  ->  ('+', 1, ('*', 2, 3))
    ast = _parse_expr("a + b * c")
    assert ast == ("+", ("col", "a"), ("*", ("col", "b"), ("col", "c")))
    ast = _parse_expr("(a + b) * c")
    assert ast == ("*", ("+", ("col", "a"), ("col", "b")), ("col", "c"))


def test_expr_parser_rejects_bare_column():
    with pytest.raises(ValueError, match="not a compound"):
        _parse_expr("a")


def test_expr_item_requires_alias():
    with pytest.raises(ValueError, match="AS alias"):
        parse("SELECT a * 2 FROM orders")


def test_eval_expr_division_is_float():
    import pyarrow as pa
    t = pa.table({"a": [3, 10], "b": [2, 4]})
    out = _eval_expr(_parse_expr("a / b"), t)
    assert out.type == pa.float64()
    assert out.to_pylist() == [1.5, 2.5]


# ----------------------------------------------------------- _sql_round

def test_sql_round_matches_duckdb_on_scaled_ties():
    cases = [(499.70505, 4), (463.53825, 4), (2.675, 2), (-2.675, 2),
             (0.125, 2), (-0.125, 2), (26.5, 0), (-26.5, 0),
             (0.49999999999999994, 0), (123456.789, 2)]
    for v, nd in cases:
        duck = duckdb.sql(f"SELECT round({v!r}::DOUBLE, {nd})").fetchone()[0]
        assert _sql_round(v, nd) == duck, (v, nd)


def test_sql_round_series_preserves_index_and_nan():
    s = pd.Series([2.675, float("nan"), -0.125], index=[7, 8, 9])
    out = _sql_round(s, 2)
    assert list(out.index) == [7, 8, 9]
    assert out.iloc[0] == 2.68 and out.iloc[2] == -0.13
    assert pd.isna(out.iloc[1])


# ----------------------------------------------------- execution vs DuckDB

CASES = [
    # TPC-H Q1 shape: aggregate over compound arithmetic
    ("""SELECT l_returnflag, COUNT(*) AS n,
ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
ROUND(AVG(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS charge
FROM lineitem WHERE l_quantity >= 25
GROUP BY l_returnflag ORDER BY l_returnflag""", ("lineitem",)),
    # plain projection expression with SQL float division + ROUND
    ("""SELECT o_orderkey, ROUND(o_totalprice / 1000, 4) AS kprice
FROM orders WHERE o_totalprice >= 450000 ORDER BY o_orderkey""",
     ("orders",)),
    # unary minus and literal-only subexpression
    ("""SELECT o_orderpriority, ROUND(SUM(-o_totalprice * -1), 2) AS rev
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
     ("orders",)),
    # TIMESTAMP literal in WHERE (o_orderdate is timestamp[us])
    ("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority ORDER BY o_orderpriority""", ("orders",)),
    # DATE literal + BETWEEN over timestamps
    ("""SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS rev
FROM orders WHERE o_orderdate BETWEEN DATE '1994-01-01'
AND DATE '1994-12-31'""", ("orders",)),
    # expression composed with join + group
    ("""SELECT c_mktsegment, ROUND(SUM(o_totalprice * 0.9), 2) AS disc_rev
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""", ("orders", "customer")),
]


@pytest.mark.parametrize("sql,tables", CASES)
def test_expr_sql_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_distinct_over_expression(ray_session):
    """SELECT DISTINCT expr rides the hidden-grouped-COUNT rewrite by
    grouping on the expression's ALIAS (the materialized column)."""
    sql = ("SELECT DISTINCT ROUND(l_discount * 100, 0) AS disc_pct, "
           "l_returnflag FROM lineitem ORDER BY disc_pct, l_returnflag")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "lineitem").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_int_group_keys_stay_int(ray_session):
    """Null-free integer GROUP BY keys must not decay to float64 through
    the NULL-group restore (pandas casts on .loc[...] = None even when
    the mask is all-False)."""
    sql = ("SELECT o_custkey, COUNT(*) AS n FROM orders "
           "GROUP BY o_custkey ORDER BY o_custkey LIMIT 5")
    mine = run_sql(SF, sql)
    assert pd.api.types.is_integer_dtype(mine["o_custkey"])
    ora = _oracle(sql, "orders")
    assert mine["o_custkey"].tolist() == ora["o_custkey"].tolist()
    assert mine["n"].tolist() == ora["n"].tolist()


def test_expr_gates_off_metadata_fastpath(ray_session, tmp_path):
    """SUM(expr) over a store must decode rows — footer stats can't fold
    SUM(a*b) — while plain SUM(col) on the same store stays O(metadata)."""
    from howard_ray.pipeline import encode_dataset

    src = SF + "/documents.parquet"
    store = str(tmp_path / "store")
    encode_dataset(src, store, mode="stream", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    plain = explain_sql(store, "SELECT SUM(n_chars) AS s FROM store")
    assert plain["path"] == "metadata"
    ex = explain_sql(store,
                     "SELECT SUM(n_chars * 2) AS s2 FROM store")
    assert ex["path"] != "metadata"
    out = run_sql(store, "SELECT SUM(n_chars * 2) AS s2 FROM store")
    base = run_sql(store, "SELECT SUM(n_chars) AS s FROM store")
    assert int(out["s2"].iloc[0]) == 2 * int(base["s"].iloc[0])


def test_group_by_rounded_alias(ray_session):
    """GROUP BY naming a ROUND(col) item's alias must group on the ROUNDED
    value (SQL resolves the alias to the whole select expression), not the
    raw column — otherwise duplicate key rows appear."""
    sql = ("SELECT ROUND(l_discount, 1) AS disc_b, COUNT(*) AS n "
           "FROM lineitem GROUP BY disc_b ORDER BY disc_b")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "lineitem").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_group_by_rounded_alias_with_agg(ray_session):
    """Rounded-alias grouping composes with a real aggregate item."""
    sql = ("SELECT ROUND(l_tax, 2) AS rt, SUM(l_quantity) AS sq "
           "FROM lineitem GROUP BY rt ORDER BY rt")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "lineitem").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_group_by_alias_shadowing_own_column(ray_session):
    """ROUND(x) AS x GROUP BY x: SQL resolves the name collision in favor
    of the PHYSICAL column (groups raw, projects rounded) — the promotion
    must not fire when alias == the ROUND argument's column."""
    sql = ("SELECT ROUND(l_tax, 2) AS l_tax, COUNT(*) AS n "
           "FROM lineitem GROUP BY l_tax ORDER BY l_tax")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "lineitem").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_round_on_aggregate_stays_on_result(ray_session):
    """ROUND(SUM(expr), n) applies to the aggregate result, not the
    per-row values."""
    sql = ("SELECT l_returnflag, "
           "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev "
           "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "lineitem").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


# -------------------------------------------------- CASE WHEN / postagg

CASE_CASES = [
    # conditional counting (Q12 shape) + no-ELSE NULL arm skipped by SUM
    ("""SELECT l_linestatus,
ROUND(SUM(CASE WHEN l_quantity > 30 THEN 1.0 ELSE 0.0 END), 2) AS n_big,
ROUND(SUM(CASE WHEN l_quantity <= 30 THEN l_extendedprice END), 2) AS rev
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""", ("lineitem",)),
    # string-valued CASE grouped via its alias
    ("""SELECT CASE WHEN n_chars > 2000 THEN 'long'
WHEN n_chars > 500 THEN 'mid' ELSE 'short' END AS bucket, COUNT(*) AS n
FROM documents GROUP BY bucket ORDER BY bucket""", ("documents",)),
    # boolean grammar in the WHEN arm: parens, AND/OR/NOT, LIKE
    ("""SELECT ROUND(SUM(CASE WHEN (l_tax + l_discount) > 0.1
OR (l_quantity < 5 AND NOT l_returnflag = 'R') THEN 1.0 ELSE 0.0 END), 2)
AS n FROM lineitem""", ("lineitem",)),
    # plain projection CASE item
    ("""SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'high'
ELSE 'low' END AS tier FROM orders ORDER BY o_orderkey LIMIT 7""",
     ("orders",)),
    # post-aggregation ratio (Q14 shape) incl. shared-aggref dedupe
    ("""SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN p_retailprice
ELSE 0.0 END) / SUM(p_retailprice) * 100, 4) AS promo_pct FROM part""",
     ("part",)),
    # per-group arithmetic over several aggregates + HAVING on the alias
    ("""SELECT l_returnflag, ROUND(SUM(l_extendedprice) / COUNT(*), 0)
AS ap FROM lineitem GROUP BY l_returnflag HAVING ap > 38000
ORDER BY l_returnflag""", ("lineitem",)),
    # group key referenced in the residual post-aggregation expression
    ("""SELECT n_chars, ROUND(SUM(n_chars) / COUNT(*) + n_chars, 2) AS x
FROM documents GROUP BY n_chars ORDER BY n_chars LIMIT 5""",
     ("documents",)),
]


@pytest.mark.parametrize("sql,tables", CASE_CASES)
def test_case_postagg_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_case_null_condition_selects_nothing(ray_session, tmp_path):
    """SQL CASE: a NULL condition falls through to the next arm / ELSE —
    three-valued logic must not leak NULL into the result the way a raw
    Kleene if_else would."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"k": [1, 2, 3, 4],
                  "v": pa.array([10.0, None, 30.0, None])})
    pq.write_table(t, tmp_path / "tt.parquet")
    sql = ("SELECT k, CASE WHEN v > 15 THEN 'big' ELSE 'small' END AS c "
           "FROM tt ORDER BY k")
    mine = run_sql(str(tmp_path), sql).reset_index(drop=True)
    ora = duckdb.sql(sql.replace("FROM tt",
                                 f"FROM '{tmp_path}/tt.parquet' tt")) \
        .df().reset_index(drop=True)
    # NULL v -> condition NULL -> ELSE arm ('small'), in both engines
    assert mine["c"].tolist() == ["small", "small", "big", "small"]
    pd.testing.assert_frame_equal(mine, ora)


def test_case_no_else_yields_null(ray_session):
    sql = ("SELECT l_linenumber, CASE WHEN l_quantity > 9999 THEN 1 END "
           "AS never FROM lineitem ORDER BY l_orderkey, l_linenumber "
           "LIMIT 3")
    mine = run_sql(SF, sql).reset_index(drop=True)
    assert mine["never"].isna().all()


def test_aggref_distinct_rejected():
    with pytest.raises(ValueError, match="DISTINCT"):
        parse("SELECT SUM(COUNT(*)) / COUNT(DISTINCT x * 2) AS r FROM t")


def test_postagg_hidden_items_not_in_output(ray_session):
    out = run_sql(SF, "SELECT ROUND(SUM(o_totalprice) / COUNT(*), 2) "
                      "AS avg_p FROM orders")
    assert list(out.columns) == ["avg_p"]


# ------------------------------------------------------ scalar functions

FN_CASES = [
    ("SELECT LOWER(lang) AS l, COUNT(*) AS n FROM documents "
     "GROUP BY l ORDER BY l LIMIT 5", ("documents",)),
    ("SELECT doc_id, LENGTH(text) AS n_len FROM documents "
     "ORDER BY doc_id LIMIT 6", ("documents",)),
    ("SELECT SUBSTR(lang, 1, 1) AS initial, COUNT(*) AS n FROM documents "
     "GROUP BY initial ORDER BY initial", ("documents",)),
    ("SELECT ROUND(SUM(ABS(l_discount - 0.05)), 4) AS s FROM lineitem",
     ("lineitem",)),
    ("SELECT o_orderkey, FLOOR(o_totalprice / 100000) AS b1, "
     "CEIL(o_totalprice / 100000) AS b2 FROM orders "
     "ORDER BY o_orderkey LIMIT 6", ("orders",)),
    # nested composition + inner ROUND (DuckDB tie parity inside SUM)
    ("SELECT l_returnflag, ROUND(SUM(ROUND(l_extendedprice, 0)), 2) AS s "
     "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
     ("lineitem",)),
    # COALESCE over the NULL arm of a no-ELSE CASE
    ("SELECT ROUND(SUM(COALESCE(CASE WHEN l_quantity > 30 "
     "THEN l_extendedprice END, 0.0)), 2) AS s FROM lineitem",
     ("lineitem",)),
]


@pytest.mark.parametrize("sql,tables", FN_CASES)
def test_scalar_fn_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_fn_name_usable_as_column():
    """A column merely NAMED like a function (no following paren) still
    parses as a column reference."""
    ast = _parse_expr("abs + 1")
    assert ast == ("+", ("col", "abs"), ("lit", 1))


def test_fn_arity_checked():
    with pytest.raises(ValueError, match="arguments"):
        _parse_expr("SUBSTR(lang, 1) + 0")


# -------------------------------------------- expression WHERE / HAVING

WEXPR_CASES = [
    # function call in WHERE
    ("SELECT lang, COUNT(*) AS n FROM documents WHERE LENGTH(text) > 1000 "
     "GROUP BY lang ORDER BY lang", ("documents",)),
    # arithmetic comparison in WHERE
    ("SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS rev "
     "FROM lineitem WHERE l_extendedprice * (1 - l_discount) > 50000",
     ("lineitem",)),
    # CASE in WHERE + expression BETWEEN
    ("SELECT COUNT(*) AS n FROM orders WHERE CASE WHEN "
     "o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END "
     "BETWEEN 100000 AND 300000", ("orders",)),
    # IN-list through the expression fallback (function on the lhs)
    ("SELECT COUNT(*) AS n FROM documents "
     "WHERE SUBSTR(lang, 1, 1) IN ('e', 'f')", ("documents",)),
    # HAVING with raw aggregates not in the SELECT list
    ("SELECT l_returnflag FROM lineitem GROUP BY l_returnflag "
     "HAVING COUNT(*) > 1000 AND SUM(l_quantity) / COUNT(*) > 25 "
     "ORDER BY l_returnflag", ("lineitem",)),
    # HAVING mixing a select alias with a raw aggregate
    ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
     "GROUP BY o_orderpriority HAVING n > 100 AND "
     "MAX(o_totalprice) > 400000 ORDER BY o_orderpriority", ("orders",)),
]


@pytest.mark.parametrize("sql,tables", WEXPR_CASES)
def test_expr_where_having_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_where_expr_gates_store_fastpath(ray_session, tmp_path):
    """An expression WHERE over a store must force a real block scan —
    footer stats can't evaluate LENGTH() — and still answer correctly."""
    from howard_ray.pipeline import encode_dataset

    src = SF + "/documents.parquet"
    store = str(tmp_path / "store")
    encode_dataset(src, store, mode="stream", resume=False,
                   columns=["doc_id", "source", "n_chars"])
    ex = explain_sql(store,
                     "SELECT COUNT(*) AS n FROM store WHERE n_chars * 2 > 800")
    assert ex["path"] != "metadata"
    out = run_sql(store,
                  "SELECT COUNT(*) AS n FROM store WHERE n_chars * 2 > 800")
    base = run_sql(store,
                   "SELECT COUNT(*) AS n FROM store WHERE n_chars > 400")
    assert int(out["n"].iloc[0]) == int(base["n"].iloc[0])


def test_having_expr_without_aggregate_select_rejected(ray_session):
    with pytest.raises(ValueError, match="HAVING requires"):
        run_sql(SF, "SELECT o_orderkey FROM orders "
                    "HAVING ABS(o_orderkey) > 2")


# ------------------------------------------------- expression ORDER BY

OEXPR_CASES = [
    # bare aggregate as sort key (selected and not)
    ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
     "GROUP BY o_orderpriority ORDER BY COUNT(*) DESC, o_orderpriority",
     ("orders",)),
    ("SELECT o_orderpriority FROM orders GROUP BY o_orderpriority "
     "ORDER BY SUM(o_totalprice) DESC LIMIT 3", ("orders",)),
    # post-aggregation ratio as sort key
    ("SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
     "GROUP BY l_returnflag ORDER BY SUM(l_extendedprice) / COUNT(*) DESC",
     ("lineitem",)),
    # row expression sort in a plain query (distributed top-k with LIMIT)
    ("SELECT doc_id, lang FROM documents "
     "ORDER BY LENGTH(text) DESC, doc_id LIMIT 6", ("documents",)),
    # expression over a group key in an aggregate query
    ("SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang "
     "ORDER BY LENGTH(lang) DESC, lang LIMIT 5", ("documents",)),
]


@pytest.mark.parametrize("sql,tables", OEXPR_CASES)
def test_order_by_expression_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora)


def test_order_expr_hidden_cols_not_in_output(ray_session):
    out = run_sql(SF, "SELECT o_orderpriority FROM orders "
                      "GROUP BY o_orderpriority ORDER BY COUNT(*) DESC")
    assert list(out.columns) == ["o_orderpriority"]


def test_order_expr_with_distinct_rejected(ray_session):
    with pytest.raises(ValueError, match="DISTINCT"):
        run_sql(SF, "SELECT DISTINCT lang FROM documents "
                    "ORDER BY LENGTH(lang)")


# ---------------------------------------- aggregates inside scalar fns
# (round-3 fix: _extract_aggrefs/_contains_aggref walk 'fn' arg tuples)

FN_AGG_CASES = [
    ("SELECT FLOOR(AVG(o_totalprice)) AS a FROM orders", ("orders",)),
    ("SELECT ABS(SUM(l_discount) - 100.0) AS d FROM lineitem",
     ("lineitem",)),
    ("SELECT o_orderstatus, COUNT(*) AS n FROM orders "
     "GROUP BY o_orderstatus HAVING FLOOR(COUNT(*) / 10) > 10 "
     "ORDER BY o_orderstatus", ("orders",)),
    ("SELECT o_orderpriority, FLOOR(SUM(o_totalprice)) AS s FROM orders "
     "GROUP BY o_orderpriority ORDER BY FLOOR(SUM(o_totalprice)) DESC",
     ("orders",)),
]


@pytest.mark.parametrize("sql,tables", FN_AGG_CASES)
def test_aggref_inside_scalar_fn_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_order_by_expr_over_select_alias(ray_session):
    # ORDER BY expression referencing a SELECT alias of a group key
    # (round-3 fix: post_expr evaluated with alias names exposed)
    sql = ("SELECT lang AS l, COUNT(*) AS n FROM documents "
           "GROUP BY lang ORDER BY LENGTH(l), l")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "documents").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_left_join_broadcast_cap(ray_session, monkeypatch):
    monkeypatch.setenv("HOWARD_SQL_BROADCAST_CAP_MB", "0")
    with pytest.raises(ValueError, match="too large to broadcast"):
        run_sql(SF, "SELECT c_custkey, o_orderkey FROM customer "
                    "LEFT JOIN orders ON c_custkey = o_custkey LIMIT 5")


# ------------------------------------------------------- window functions

WIN_CASES = [
    ("SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS rn FROM events ORDER BY event_id",
     ("events",)),
    ("SELECT event_id, LAG(value) OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS pv, LEAD(value, 3) OVER (PARTITION BY "
     "user_id ORDER BY ts, event_id) AS nv FROM events ORDER BY event_id",
     ("events",)),
    # RANGE-peer running sum + rank with DESC order + partition-wide agg
    ("SELECT o_orderkey, RANK() OVER (PARTITION BY o_orderpriority "
     "ORDER BY o_totalprice DESC) AS r, ROUND(AVG(o_totalprice) OVER "
     "(PARTITION BY o_orderpriority), 2) AS ap FROM orders "
     "WHERE o_totalprice >= 420000 ORDER BY o_orderkey", ("orders",)),
    ("SELECT l_orderkey, l_linenumber, ROUND(SUM(l_quantity) OVER "
     "(PARTITION BY l_orderkey ORDER BY l_linenumber), 2) AS rq "
     "FROM lineitem WHERE l_orderkey <= 800 "
     "ORDER BY l_orderkey, l_linenumber", ("lineitem",)),
    # WHERE + LIMIT compose with windows
    ("SELECT event_id, COUNT(*) OVER (PARTITION BY user_id) AS n "
     "FROM events WHERE value >= 50 ORDER BY event_id LIMIT 200",
     ("events",)),
]


@pytest.mark.parametrize("sql,tables", WIN_CASES)
def test_window_functions_match_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_window_rejects_aggregate_mix(ray_session):
    with pytest.raises(ValueError, match="window functions combine"):
        run_sql(SF, "SELECT user_id, COUNT(*) AS n, ROW_NUMBER() OVER "
                    "(PARTITION BY user_id ORDER BY ts) AS rn "
                    "FROM events GROUP BY user_id")


def test_window_rejects_mixed_partitions(ray_session):
    with pytest.raises(ValueError, match="share the same"):
        run_sql(SF, "SELECT ROW_NUMBER() OVER (PARTITION BY user_id "
                    "ORDER BY ts) AS a, ROW_NUMBER() OVER (PARTITION BY "
                    "event_type ORDER BY ts) AS b FROM events")


# ----------------------------------------------------------- WITH / CTEs

CTE_CASES = [
    ("WITH big AS (SELECT o_custkey, COUNT(*) AS n, "
     "ROUND(SUM(o_totalprice), 2) AS rev FROM orders GROUP BY o_custkey "
     "HAVING n >= 8) SELECT c_mktsegment, COUNT(*) AS n_cust, "
     "ROUND(SUM(rev), 2) AS seg_rev FROM big JOIN customer "
     "ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment",
     ("orders", "customer")),
    # chained CTEs: b reads a
    ("WITH a AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
     "GROUP BY l_returnflag), b AS (SELECT l_returnflag, n FROM a "
     "WHERE n >= 100) SELECT l_returnflag, n FROM b ORDER BY l_returnflag",
     ("lineitem",)),
    # CTE + window function downstream
    ("WITH ev AS (SELECT user_id, event_id, value FROM events "
     "WHERE value >= 20) SELECT event_id, ROW_NUMBER() OVER "
     "(PARTITION BY user_id ORDER BY event_id) AS rn FROM ev "
     "ORDER BY event_id LIMIT 500", ("events",)),
]


@pytest.mark.parametrize("sql,tables", CTE_CASES)
def test_with_cte_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_cte_shadows_base_table(ray_session):
    # a CTE named like a base table shadows it for the main query
    out = run_sql(SF, "WITH nation AS (SELECT n_nationkey FROM nation "
                      "WHERE n_nationkey < 3) SELECT COUNT(*) AS n "
                      "FROM nation")
    assert out["n"].iloc[0] == 3


# ------------------------------------------------------- UNION [ALL]

UNION_CASES = [
    ("SELECT 'high' AS band, COUNT(*) AS n FROM orders "
     "WHERE o_totalprice >= 300000 UNION ALL "
     "SELECT 'low' AS band, COUNT(*) AS n FROM orders "
     "WHERE o_totalprice < 300000 ORDER BY band", ("orders",)),
    ("SELECT o_orderpriority AS k FROM orders WHERE o_totalprice >= 480000 "
     "UNION SELECT o_orderpriority AS k FROM orders "
     "WHERE o_orderpriority = '1-URGENT' ORDER BY k", ("orders",)),
]


@pytest.mark.parametrize("sql,tables", UNION_CASES)
def test_union_matches_duckdb(ray_session, sql, tables):
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, *tables).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_union_with_empty_cte_side(ray_session):
    # empty CTE keeps key dtypes, joins still run, literal+COUNT backfills
    sql = ("WITH hi AS (SELECT o_custkey FROM orders "
           "WHERE o_totalprice >= 99999999) "
           "SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer "
           "JOIN hi ON c_custkey = o_custkey GROUP BY c_mktsegment "
           "UNION ALL SELECT 'TOTAL' AS seg, COUNT(*) AS n FROM hi "
           "ORDER BY seg")
    out = run_sql(SF, sql)
    assert out.to_dict("records") == [{"seg": "TOTAL", "n": 0}]


def test_derived_table_matches_duckdb(ray_session):
    sql = ("SELECT c_mktsegment, COUNT(*) AS n_cust, "
           "ROUND(SUM(rev), 2) AS seg_rev FROM (SELECT o_custkey, "
           "ROUND(SUM(o_totalprice), 2) AS rev FROM orders "
           "GROUP BY o_custkey) r JOIN customer ON o_custkey = c_custkey "
           "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "orders", "customer").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_derived_table_requires_alias(ray_session):
    with pytest.raises(ValueError, match="alias"):
        run_sql(SF, "SELECT COUNT(*) AS n FROM "
                    "(SELECT o_custkey FROM orders)")


# ------------------------------- literal-aware structural scans (round 4)

def test_union_keyword_inside_string_literal(ray_session):
    # ' union ' in a literal must NOT split the query (literal-masked scan)
    sql = ("SELECT doc_id FROM documents "
           "WHERE lang = 'no union here' ORDER BY doc_id LIMIT 3")
    mine = run_sql(SF, sql)
    assert len(mine) == 0
    sql2 = ("SELECT 'a UNION b' AS t, COUNT(*) AS n FROM events")
    mine2 = run_sql(SF, sql2)
    ora2 = _oracle(sql2, "events")
    pd.testing.assert_frame_equal(mine2, ora2, check_dtype=False)


def test_from_paren_inside_string_literal(ray_session):
    # 'FROM (' and an unbalanced paren inside literals must not trigger
    # the derived-table rewrite or break paren-depth scans
    sql = ("SELECT event_id, 'FROM (x' AS marker FROM events "
           "WHERE event_type = 'a(b' ORDER BY event_id LIMIT 2")
    mine = run_sql(SF, sql)
    assert list(mine.columns) == ["event_id", "marker"]
    assert len(mine) == 0


def test_literal_with_escaped_quote_in_cte(ray_session):
    sql = ("WITH x AS (SELECT event_id, event_type FROM events "
           "WHERE event_type <> 'it''s (odd' ) "
           "SELECT COUNT(*) AS n FROM x")
    mine = run_sql(SF, sql)
    ora = _oracle("SELECT COUNT(*) AS n FROM events "
                  "WHERE event_type <> 'it''s (odd'", "events")
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


# ------------------------- window + expression items mixing (round 4)

def test_window_mixed_with_expression_item(ray_session):
    sql = ("SELECT event_id, value * 2 AS d, ROW_NUMBER() OVER "
           "(PARTITION BY user_id ORDER BY ts, event_id) AS rn "
           "FROM events ORDER BY event_id LIMIT 50")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "events").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_window_order_by_non_selected_column(ray_session):
    sql = ("SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id "
           "ORDER BY ts, event_id) AS rn FROM events "
           "ORDER BY user_id, ts, event_id LIMIT 40")
    mine = run_sql(SF, sql).reset_index(drop=True)
    ora = _oracle(sql, "events").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)
