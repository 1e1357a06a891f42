"""Incrementally-maintained materialized views (howard_ray.view): the
refresh must equal a full recompute after every lifecycle event, decide
noop/incremental/rebaseline correctly, and survive a crash mid-publish."""

import json
import os

import duckdb
import numpy as np
import pytest

from howard_ray.fixtures import write_corpus
from howard_ray.pipeline import (append_to_store, compact_store,
                                 delete_where, encode_dataset)
from howard_ray.view import create_view, read_view, refresh_view

AGGS = {"n": ("count",), "sum_tok": ("sum", "n_tok"),
        "min_tok": ("min", "n_tok"), "max_tok": ("max", "n_tok"),
        "avg_tok": ("avg", "n_tok")}


def _expect(srcs, where="1=1"):
    u = " UNION ALL ".join(f"SELECT * FROM '{s}'" for s in srcs)
    return duckdb.sql(
        f"SELECT source, COUNT(*) AS n, SUM(n_tok) AS sum_tok, "
        f"MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok, "
        f"AVG(n_tok) AS avg_tok FROM ({u}) WHERE {where} "
        f"GROUP BY source ORDER BY source").df()


def _check(view_dir, exp):
    got = read_view(view_dir)
    assert got["source"].tolist() == exp["source"].tolist()
    for c in ("n", "sum_tok", "min_tok", "max_tok"):
        assert got[c].tolist() == [int(x) for x in exp[c]], c
    assert np.allclose(got["avg_tok"], exp["avg_tok"])


def test_view_lifecycle(ray_session, tmp_path):
    d1, d2, d3 = (str(tmp_path / f"d{i}.parquet") for i in (1, 2, 3))
    write_corpus(d1, 2500, seed=3)
    write_corpus(d2, 1500, seed=4)
    write_corpus(d3, 1000, seed=5)
    st, vw = str(tmp_path / "st"), str(tmp_path / "vw")
    encode_dataset(d1, st, mode="cluster", target_rows=400)

    r = create_view(st, vw, ["source"], AGGS)
    assert r["rows_aggregated"] == 2500
    _check(vw, _expect([d1]))

    # nothing changed -> noop, zero decodes
    assert refresh_view(vw)["mode"] == "noop"

    # two appends, one refresh: only the new epochs' rows aggregate
    append_to_store(st, d2, mode="cluster", target_rows=400)
    append_to_store(st, d3, mode="cluster", target_rows=400)
    r = refresh_view(vw)
    assert r["mode"] == "incremental" and r["rows_delta"] == 2500
    _check(vw, _expect([d1, d2, d3]))

    # a delete voids the merge law -> rebaseline, still exact
    delete_where(st, ("source", "==", "code"))
    r = refresh_view(vw)
    assert r["mode"] == "rebaseline"
    _check(vw, _expect([d1, d2, d3], "source != 'code'"))

    # a compaction rewrites then-live blocks -> the change feed refuses,
    # refresh falls back to rebaseline and stays exact
    append_to_store(st, d2, mode="cluster", target_rows=400)
    compact_store(st, target_rows=400)
    r = refresh_view(vw)
    assert r["mode"] == "rebaseline"
    # the delete hit only the rows present at delete time: the post-delete
    # d2 re-append's 'code' rows are live again
    exp = duckdb.sql(
        "SELECT source, COUNT(*) AS n, SUM(n_tok) AS sum_tok, "
        "MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok, "
        "AVG(n_tok) AS avg_tok FROM (SELECT * FROM (SELECT * FROM '{0}' "
        "UNION ALL SELECT * FROM '{1}' UNION ALL SELECT * FROM '{2}') "
        "WHERE source != 'code' UNION ALL SELECT * FROM '{1}') "
        "GROUP BY source ORDER BY source".format(d1, d2, d3)).df()
    _check(vw, exp)


def test_view_crash_between_data_and_state(ray_session, tmp_path):
    """A new data parquet without the state swap must be invisible."""
    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1200, seed=6)
    st, vw = str(tmp_path / "st"), str(tmp_path / "vw")
    encode_dataset(src, st, mode="stream", target_rows=400)
    create_view(st, vw, ["source"], {"n": ("count",)})
    before = read_view(vw)

    # simulate a crash: stray newer data file, state.json still old
    stray = os.path.join(vw, "view-99999999-9.parquet")
    before.assign(n=0).to_parquet(stray, index=False)
    assert read_view(vw).equals(before)  # state still points at old data

    # next successful refresh GCs the stray file
    append_to_store(st, src, mode="stream", target_rows=400)
    refresh_view(vw)
    assert not os.path.exists(stray)
    assert read_view(vw)["n"].sum() == 2400


def test_view_cli(ray_session, tmp_path):
    from howard_ray.cli import main

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 800, seed=8)
    st, vw = str(tmp_path / "st"), str(tmp_path / "vw")
    encode_dataset(src, st, mode="stream", target_rows=400)
    assert main(["view", "create", vw, "--store", st,
                 "--group-by", "source",
                 "--aggs", json.dumps({"n": ["count"],
                                       "toks": ["sum", "n_tok"]})]) == 0
    assert main(["view", "refresh", vw]) == 0
    assert main(["view", "read", vw]) == 0
    got = read_view(vw)
    exp = duckdb.sql(f"SELECT source, COUNT(*) n, SUM(n_tok) toks FROM "
                     f"'{src}' GROUP BY source ORDER BY source").df()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["toks"].tolist() == [int(x) for x in exp["toks"]]


def test_filtered_view(ray_session, tmp_path):
    """Filtered materialized view: the WHERE conjunction rides into the
    base scan AND every change-feed delta read (zone pruning + pushdown),
    and the incremental refresh still equals the full filtered GROUP BY."""
    d1, d2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    write_corpus(d1, 2000, seed=61)
    write_corpus(d2, 1200, seed=62)
    st, vw = str(tmp_path / "st"), str(tmp_path / "vw")
    encode_dataset(d1, st, mode="cluster", target_rows=400)
    create_view(st, vw, ["source"],
                {"n": ("count",), "s": ("sum", "n_tok")},
                where=[("n_tok", ">=", 500), ("source", "!=", "legal")])
    append_to_store(st, d2, mode="cluster", target_rows=400)
    r = refresh_view(vw)
    assert r["mode"] == "incremental"
    got = read_view(vw)
    exp = duckdb.sql(
        f"SELECT source, COUNT(*) AS n, SUM(n_tok) AS s FROM (SELECT * "
        f"FROM '{d1}' UNION ALL SELECT * FROM '{d2}') "
        "WHERE n_tok >= 500 AND source != 'legal' "
        "GROUP BY source ORDER BY source").df()
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n"].tolist() == [int(x) for x in exp["n"]]
    assert got["s"].tolist() == [int(x) for x in exp["s"]]

    # a view whose predicate matches nothing stays readable (typed empty)
    vw2 = str(tmp_path / "vw2")
    create_view(st, vw2, ["source"], {"n": ("count",)},
                where=[("n_tok", ">", 10**9)])
    assert len(read_view(vw2)) == 0
    assert refresh_view(vw2)["mode"] == "noop"


def test_view_null_group_matches_sql_semantics(ray_session, tmp_path):
    """NULL group keys survive and all-null SUM stays NULL — the view
    must agree with the engine's GROUP BY (and DuckDB)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from howard_ray.pipeline import encode_dataset
    from howard_ray.view import create_view, read_view

    n = 200
    src = [None if i % 4 == 0 else f"s{i % 2}" for i in range(n)]
    val = [None if i % 4 == 0 else float(i % 9) for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(src), "v": pa.array(val, type=pa.float64())}),
        str(tmp_path / "d.parquet"))
    st = str(tmp_path / "store")
    encode_dataset(str(tmp_path / "d.parquet"), st, mode="cluster",
                   target_rows=100, resume=False)
    vd = str(tmp_path / "view")
    create_view(st, vd, ["source"], {"n": ("count",), "sv": ("sum", "v")})
    out = read_view(vd).sort_values("source", na_position="last") \
        .reset_index(drop=True)
    assert len(out) == 3                       # s0, s1 AND the NULL group
    null_row = out[out["source"].isna()]
    assert len(null_row) == 1
    assert int(null_row["n"].iloc[0]) == n // 4
    assert pd.isna(null_row["sv"].iloc[0])     # all-null SUM stays NULL
