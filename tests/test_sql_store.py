"""Mini-SQL `FROM store`: the SQL surface composed with the encoded-store
scan (pruned columns + pushed-down predicate), equal to the same query over
the raw parquet."""

import duckdb
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.pipeline import encode_dataset
from howard_ray.sqlmini import run_sql

SQL = ("SELECT source, COUNT(*) AS n, ROUND(SUM(n_tok), 2) AS toks "
       "FROM store WHERE n_tok >= 200 GROUP BY source ORDER BY source")


def test_sql_from_store_matches_duckdb(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1500, seed=13)
    st = str(tmp_path / "st")
    encode_dataset(src, st, mode="cluster", target_rows=300)

    out = run_sql(st, SQL)
    exp = duckdb.sql(SQL.replace("FROM store", f"FROM '{src}'")).df()
    assert out.reset_index(drop=True).equals(exp.reset_index(drop=True))

    # projection + pushdown only (no aggregate) round-trips too
    out2 = run_sql(st, "SELECT doc_id, n_tok FROM store "
                       "WHERE n_tok >= 600 ORDER BY doc_id")
    t = pq.read_table(src)
    import pyarrow.compute as pc
    exp_n = pc.sum(pc.cast(pc.greater_equal(t["n_tok"], 600),
                           "int64")).as_py() or 0
    assert len(out2) == exp_n
