"""Operator-vs-DuckDB-oracle tests at sf0.001 (the reference's test style:
run operator, assert exact values via SQL on the same data — SURVEY.md §5)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _names():
    from howard_ray.ops import all_oracle_sql
    return sorted(all_oracle_sql())


@pytest.mark.parametrize("name", _names())
def test_operator_matches_oracle(ray_session, con, name):
    from tools.check_oracles import to_df
    from howard_ray.ops import all_oracle_sql, all_queries

    res = canon(to_df(all_queries()[name](SF_DIR)))
    exp = canon(con.execute(all_oracle_sql()[name]).fetchdf())
    assert list(res.columns) == list(exp.columns)
    assert len(res) == len(exp), f"{name}: {len(res)} vs {len(exp)} rows"
    pd.testing.assert_frame_equal(res, exp, check_dtype=False)


def test_rows_only_ops_run(ray_session):
    from howard_ray.ops import all_oracle_sql, all_queries

    q = all_queries()
    sql = all_oracle_sql()
    for name in set(q) - set(sql):
        out = q[name](SF_DIR)
        assert out is not None


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) >= 1
    assert {"block_id", "n_rows", "encoded_bytes", "tokens_codec"} <= set(df.columns)
