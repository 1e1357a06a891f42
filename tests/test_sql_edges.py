"""Regression tests for the round-5 sqlmini deep-review findings:
HAVING OR on fast paths, HAVING LIKE, NULL groups and null-aware AVG in
the metadata paths, ROUND in window/grouped fast paths, identifier names
containing 'union', DISTINCT-expression EXPLAIN, duplicate aliases, and
int64-exact window ordering."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.sqlmini import explain_sql, run_sql


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sqledge")
    n = 60
    rng = np.random.default_rng(5)
    pq.write_table(pa.table({
        "k": pa.array((np.arange(n) % 5).astype(np.int64)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "price": pa.array(np.round(rng.uniform(1, 9, n), 3)),
        "name": pa.array([f"docs_{i % 3}" for i in range(n)]),
        "big": pa.array((1 << 53) + np.arange(n, dtype=np.int64) % 3),
        "docs_union": pa.array(np.arange(n, dtype=np.int64)),
    }), str(d / "events.parquet"))
    return str(d)


def _ora(tdir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tdir}/events.parquet'")
    return con.execute(sql).df().reset_index(drop=True)


def _both(tdir, sql, **kw):
    mine = run_sql(tdir, sql, **kw).reset_index(drop=True)
    ora = _ora(tdir, sql)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)
    return mine


def test_having_like(ray_session, tdir):
    _both(tdir, "SELECT name, COUNT(*) AS n FROM events GROUP BY name "
                "HAVING name LIKE 'docs__' ORDER BY name")
    _both(tdir, "SELECT name, COUNT(*) AS n FROM events GROUP BY name "
                "HAVING name NOT LIKE '%_0' ORDER BY name")


def test_identifier_containing_union(ray_session, tdir):
    _both(tdir, "SELECT docs_union FROM events "
                "WHERE docs_union < 5 ORDER BY docs_union")


def test_duplicate_column_two_aliases(ray_session, tdir):
    _both(tdir, "SELECT k AS x, k AS y FROM events "
                "WHERE rid < 4 ORDER BY x, y")


def test_window_round_on_plain_item(ray_session, tdir):
    _both(tdir, "SELECT rid, ROUND(price, 1) AS p, "
                "RANK() OVER (PARTITION BY k ORDER BY rid) AS rk "
                "FROM events ORDER BY rid")


def test_window_order_by_int_beyond_2_53(ray_session, tdir):
    """big takes only values 2^53, 2^53+1, 2^53+2 — identical under
    float64, distinct under the exact int sort keys."""
    _both(tdir, "SELECT rid, RANK() OVER (PARTITION BY k ORDER BY big) "
                "AS r FROM events ORDER BY rid")
    _both(tdir, "SELECT rid, RANK() OVER (PARTITION BY k "
                "ORDER BY big DESC) AS r FROM events ORDER BY rid")


def test_explain_distinct_expression(ray_session, tdir):
    out = explain_sql(tdir, "SELECT DISTINCT k + 1 AS s FROM events")
    assert isinstance(out, dict)


@pytest.fixture(scope="module")
def null_store(ray_session, tmp_path_factory):
    """Store whose group column AND value column carry nulls (those
    blocks publish no stats — the 'mixed' path of the metadata
    answers)."""
    from howard_ray.pipeline import encode_dataset

    d = tmp_path_factory.mktemp("nullstore")
    n = 400
    src = [None if i % 7 == 0 else f"s{i % 3}" for i in range(n)]
    val = [None if i % 5 == 0 else float(i % 11) for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(src),
        "v": pa.array(val, type=pa.float64()),
    }), str(d / "docs.parquet"))
    st = str(d / "store")
    encode_dataset(str(d / "docs.parquet"), st, mode="cluster",
                   target_rows=100, resume=False)
    return str(d), st


def _store_both(null_store, sql):
    d, st = null_store
    mine = run_sql(st, sql).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW store AS SELECT * FROM '{d}/docs.parquet'")
    ora = con.execute(sql).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_store_group_by_keeps_null_group(ray_session, null_store):
    _store_both(null_store,
                "SELECT source, COUNT(*) AS n, ROUND(AVG(v), 4) AS av "
                "FROM store GROUP BY source ORDER BY source")


def test_store_avg_skips_nulls_with_where(ray_session, null_store):
    _store_both(null_store,
                "SELECT ROUND(AVG(v), 4) AS av, COUNT(*) AS n "
                "FROM store WHERE doc_id >= 10")


def test_store_having_or_not_ignored(ray_session, null_store):
    _store_both(null_store,
                "SELECT source, COUNT(*) AS n FROM store "
                "GROUP BY source HAVING n < 60 OR n > 130 "
                "ORDER BY source")
