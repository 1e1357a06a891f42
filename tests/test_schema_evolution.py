"""Schema evolution on append: a delivery may carry columns earlier epochs
never had (and vice versa). Blocks predating a column decode it as TYPED
nulls (type discovered from one donor header probe), predicates on such a
column prune pre-epoch blocks driver-side (NULL never matches — SQL
semantics), and the decoded union schema is uniform enough to write."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.pipeline import append_to_store, decode_store, encode_dataset


def _mixed_store(tmp_path, n1=1200, n2=700):
    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    write_corpus(d1, n1, seed=51)
    write_corpus(str(tmp_path / "raw2.parquet"), n2, seed=52)
    t2 = pq.read_table(str(tmp_path / "raw2.parquet"))
    t2 = t2.append_column("lang", pa.array(["en", "fr"] * (n2 // 2)
                                           + ["en"] * (n2 % 2)))
    t2 = t2.append_column("score", pa.array([float(i % 7) / 2
                                             for i in range(n2)]))
    pq.write_table(t2, d2)
    st = str(tmp_path / "st")
    encode_dataset(d1, st, mode="stream", target_rows=400)
    append_to_store(st, d2, mode="stream", target_rows=400)
    return d1, d2, st


def test_union_schema_decode(ray_session, tmp_path):
    d1, d2, st = _mixed_store(tmp_path)
    out = decode_store(st).to_pandas()
    assert len(out) == 1900
    assert list(out.columns) == ["doc_id", "tokens", "n_tok", "source",
                                 "lang", "score"]
    # typed nulls exactly on the pre-epoch rows
    assert int(out["lang"].isna().sum()) == 1200
    assert int(out["score"].isna().sum()) == 1200
    exp = duckdb.sql(f"SELECT COUNT(*) FROM '{d2}' "
                     "WHERE lang = 'fr'").fetchone()[0]
    assert int((out["lang"] == "fr").sum()) == exp

    # projection over a divergent column fills too
    p = decode_store(st, columns=["doc_id", "score"]).to_pandas()
    assert len(p) == 1900 and int(p["score"].isna().sum()) == 1200

    # the union schema is uniform across tasks: parquet write round-trips
    outp = str(tmp_path / "out")
    decode_store(st).write_parquet(outp)
    tt = pq.read_table(outp)
    assert tt.num_rows == 1900
    assert tt.schema.field("lang").type == pa.string()
    assert pa.types.is_floating(tt.schema.field("score").type)


def test_predicate_prunes_pre_epoch_blocks(ray_session, tmp_path):
    d1, d2, st = _mixed_store(tmp_path)
    # every op rejects NULL, so pre-epoch blocks prune at the driver
    got = decode_store(st, columns=["doc_id", "lang"],
                       predicate=("lang", "==", "en")).to_pandas()
    exp = duckdb.sql(f"SELECT COUNT(*) FROM '{d2}' "
                     "WHERE lang = 'en'").fetchone()[0]
    assert len(got) == exp
    got2 = decode_store(st, columns=["doc_id"],
                        predicate=("score", ">=", 1.0)).to_pandas()
    exp2 = duckdb.sql(f"SELECT COUNT(*) FROM '{d2}' "
                      "WHERE score >= 1.0").fetchone()[0]
    assert len(got2) == exp2
    # != also rejects NULL (SQL semantics, same as the DuckDB oracle)
    got3 = decode_store(st, columns=["doc_id"],
                        predicate=("lang", "!=", "en")).to_pandas()
    exp3 = duckdb.sql(f"SELECT COUNT(*) FROM '{d2}' "
                      "WHERE lang != 'en'").fetchone()[0]
    assert len(got3) == exp3


def test_sql_over_evolved_store(ray_session, tmp_path):
    from howard_ray.sqlmini import run_sql

    d1, d2, st = _mixed_store(tmp_path)
    got = run_sql(st, "SELECT COUNT(*) AS n FROM store WHERE lang = 'fr'")
    exp = duckdb.sql(f"SELECT COUNT(*) FROM '{d2}' "
                     "WHERE lang = 'fr'").fetchone()[0]
    assert int(got["n"].iloc[0]) == exp
    # global aggregates over the always-present columns stay exact
    g = run_sql(st, "SELECT COUNT(*) AS n, SUM(n_tok) AS s FROM store")
    e = duckdb.sql(f"SELECT COUNT(*) n, SUM(n_tok) s FROM (SELECT * FROM "
                   f"'{d1}' UNION ALL SELECT doc_id, tokens, n_tok, source "
                   f"FROM '{d2}')").df()
    assert int(g["n"].iloc[0]) == int(e["n"].iloc[0])
    assert int(g["s"].iloc[0]) == int(e["s"].iloc[0])


def test_unknown_column_still_raises(ray_session, tmp_path):
    _, _, st = _mixed_store(tmp_path, 300, 200)
    with pytest.raises(Exception):
        decode_store(st, columns=["no_such_col"]).to_pandas()
