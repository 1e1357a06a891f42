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

META_SQL = ("SELECT COUNT(*) AS n, SUM(n_tok) AS tok, MIN(n_tok) AS lo, "
            "MAX(n_tok) AS hi, ROUND(AVG(n_tok), 4) AS avg_tok, "
            "MAX(source) AS max_src FROM store")


def test_sql_store_metadata_fast_path(ray_session, tmp_path):
    """Pure-aggregate SELECT with no WHERE/GROUP BY is answered from the
    footer zone maps alone: result equals DuckDB on the raw parquet, and
    still comes back with the blocks directory physically removed (proof
    that ZERO blocks are decoded)."""
    import os
    import shutil

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1200, seed=29)
    st = str(tmp_path / "st_meta")
    encode_dataset(src, st, mode="cluster", target_rows=300)

    out = run_sql(st, META_SQL)
    exp = duckdb.sql(META_SQL.replace("FROM store", f"FROM '{src}'")).df()
    for c in out.columns:
        assert out[c].iloc[0] == pytest.approx(exp[c].iloc[0]), c

    shutil.move(os.path.join(st, "blocks"), str(tmp_path / "blocks_bak"))
    try:
        out2 = run_sql(st, META_SQL)
        assert out2.equals(out)
    finally:
        shutil.move(str(tmp_path / "blocks_bak"), os.path.join(st, "blocks"))


def test_sql_store_metadata_gates(ray_session, tmp_path):
    """The fast path declines whenever it would be unsound: WHERE clauses
    scan blocks, and pending tombstones force the scan so deleted rows are
    never counted back to life."""
    from howard_ray.pipeline import delete_where
    from howard_ray.sqlmini import _store_metadata_answer, parse

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 800, seed=31)
    st = str(tmp_path / "st_gate")
    encode_dataset(src, st, mode="cluster", target_rows=200)

    assert _store_metadata_answer(
        st, parse("SELECT COUNT(*) AS n FROM store WHERE n_tok >= 5")) is None
    assert _store_metadata_answer(
        st, parse("SELECT source, COUNT(*) AS n FROM store "
                  "GROUP BY source")) is None
    assert _store_metadata_answer(
        st, parse("SELECT COUNT(DISTINCT source) AS n FROM store")) is None

    before = run_sql(st, "SELECT COUNT(*) AS n, SUM(n_tok) AS tok FROM store")
    delete_where(st, ("source", "==", "web"))
    after = run_sql(st, "SELECT COUNT(*) AS n, SUM(n_tok) AS tok FROM store")
    exp = duckdb.sql("SELECT COUNT(*) AS n, SUM(n_tok) AS tok "
                     f"FROM '{src}' WHERE source != 'web'").df()
    assert int(after["n"].iloc[0]) == int(exp["n"].iloc[0])
    assert int(after["tok"].iloc[0]) == int(exp["tok"].iloc[0])
    assert int(before["n"].iloc[0]) > int(after["n"].iloc[0])


def test_sql_store_pushdown_aggregate(ray_session, tmp_path):
    """Zone-complete aggregate pushdown: WHERE-filtered COUNT/SUM/MIN/MAX/AVG
    classify blocks all/none/partial against the footer; all-match blocks
    never decode. On a source-clustered store, a source= predicate is fully
    metadata-answerable (proven by removing the blocks dir); a straddling
    range conjunct decodes only the partial blocks and still matches DuckDB."""
    import os
    import shutil

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2000, seed=37)
    st = str(tmp_path / "st_push")
    encode_dataset(src, st, mode="cluster", target_rows=400)

    q_mixed = ("SELECT COUNT(*) AS n, SUM(n_tok) AS tok, MIN(n_tok) AS lo, "
               "MAX(n_tok) AS hi, ROUND(AVG(n_tok), 4) AS avg_tok "
               "FROM store WHERE source = 'web' AND n_tok >= 300")
    out = run_sql(st, q_mixed)
    exp = duckdb.sql(q_mixed.replace("FROM store", f"FROM '{src}'")).df()
    for c in out.columns:
        assert out[c].iloc[0] == pytest.approx(exp[c].iloc[0]), c

    # empty-match SUM degrades to SQL NULL, COUNT to 0
    none = run_sql(st, "SELECT COUNT(*) AS n, SUM(n_tok) AS tok "
                       "FROM store WHERE n_tok > 10000000")
    assert int(none["n"].iloc[0]) == 0 and none["tok"].isna().all()

    # source-clustered blocks: a source-only predicate needs ZERO decodes
    q_src = "SELECT COUNT(*) AS n, SUM(n_tok) AS tok FROM store WHERE source = 'wiki'"
    expect = run_sql(st, q_src)
    shutil.move(os.path.join(st, "blocks"), str(tmp_path / "bp_bak"))
    try:
        again = run_sql(st, q_src)
        assert again.equals(expect)
    finally:
        shutil.move(str(tmp_path / "bp_bak"), os.path.join(st, "blocks"))


def test_sql_store_grouped_metadata(ray_session, tmp_path):
    """Grouped O(metadata) aggregates: on a source-clustered store every
    block is single-valued in the group column, so GROUP BY source answers
    entirely from footer stats (blocks dir removed); a stream store mixes
    sources per block and falls back to decoding exactly those, still
    matching DuckDB."""
    import os
    import shutil

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 2000, seed=41)
    q = ("SELECT source, COUNT(*) AS n, SUM(n_tok) AS tok, "
         "MIN(n_tok) AS lo, MAX(n_tok) AS hi, "
         "ROUND(AVG(n_tok), 4) AS avg_tok FROM store "
         "GROUP BY source ORDER BY source")
    exp = duckdb.sql(q.replace("FROM store", f"FROM '{src}'")).df() \
        .reset_index(drop=True)

    st = str(tmp_path / "st_clustered")
    encode_dataset(src, st, mode="cluster", target_rows=400)
    out = run_sql(st, q).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(out.astype(exp.dtypes.to_dict()), exp)

    shutil.move(os.path.join(st, "blocks"), str(tmp_path / "g_bak"))
    try:
        again = run_sql(st, q)
        assert again.equals(out)
    finally:
        shutil.move(str(tmp_path / "g_bak"), os.path.join(st, "blocks"))

    st2 = str(tmp_path / "st_stream")
    encode_dataset(src, st2, mode="stream", target_rows=500)
    out2 = run_sql(st2, q).reset_index(drop=True)
    pd.testing.assert_frame_equal(out2.astype(exp.dtypes.to_dict()), exp)


def test_sql_store_in_predicate_bloom(ray_session, tmp_path):
    """IN (...) through SQL over a store: pushed as the decode 'in'
    predicate, so Bloom sidecars skip definite-miss blocks before any
    decode; result matches DuckDB on the raw parquet."""
    import pyarrow.parquet as pq

    from howard_ray.pipeline import build_bloom_index

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1500, seed=43)
    st = str(tmp_path / "st_in")
    encode_dataset(src, st, mode="cluster", target_rows=300)
    build_bloom_index(st, "doc_id")

    ids = pq.read_table(src, columns=["doc_id"])["doc_id"].to_pylist()[:3]
    q = ("SELECT COUNT(*) AS n, SUM(n_tok) AS tok FROM store "
         "WHERE doc_id IN (" + ", ".join(f"'{i}'" for i in ids) + ", 'zz')")
    out = run_sql(st, q)
    exp = duckdb.sql(q.replace("FROM store", f"FROM '{src}'")).df()
    assert int(out["n"].iloc[0]) == int(exp["n"].iloc[0]) == 3
    assert int(out["tok"].iloc[0]) == int(exp["tok"].iloc[0])


def test_explain_sql_matches_execution_paths(ray_session, tmp_path):
    """EXPLAIN reports the executor's real dispatch: grouped-metadata on a
    clustered store (all blocks metadata-answered), pushdown-aggregate
    census consistent, store-scan for non-aggregate SELECTs, broadcast-join
    and table-scan for parquet tables."""
    from howard_ray.sqlmini import explain_sql

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1000, seed=47)
    st = str(tmp_path / "st_ex")
    encode_dataset(src, st, mode="cluster", target_rows=300)

    e = explain_sql(st, "SELECT source, COUNT(*) AS n FROM store "
                        "GROUP BY source")
    assert e["path"] == "grouped-metadata"
    assert e["blocks"]["metadata"] == e["blocks"]["total"]

    e2 = explain_sql(st, "SELECT COUNT(*) AS n FROM store "
                         "WHERE source = 'web' AND n_tok >= 300")
    assert e2["path"] == "pushdown-aggregate"
    b = e2["blocks"]
    assert b["pruned"] + b["metadata"] + b["decoded"] == b["total"]
    assert b["pruned"] > 0  # other sources' blocks never decode
    assert e2["pushed_predicate"] == ["source", "==", "web"]

    e3 = explain_sql(st, "SELECT doc_id, n_tok FROM store "
                         "WHERE n_tok >= 100")
    assert e3["path"] == "store-scan"

    sf = "/root/testdata/sf0.001"
    e4 = explain_sql(sf, "SELECT c_mktsegment, COUNT(*) AS n FROM orders "
                         "JOIN customer ON o_custkey = c_custkey "
                         "GROUP BY c_mktsegment")
    assert e4["path"] == "broadcast-join"
    assert e4["broadcast_dims"] == ["customer"]
    assert explain_sql(sf, "SELECT COUNT(*) AS n FROM orders")["path"] \
        == "table-scan"


def test_sql_store_order_limit_scan(ray_session, tmp_path):
    """ORDER BY key LIMIT k over a store clustered on the key decodes only
    the edge block(s) — and stays correct (full scan) when unclustered or
    when the ORDER BY references a non-selected column."""
    from howard_ray import sqlmini
    from howard_ray.pipeline import recluster_store
    from howard_ray.sqlmini import explain_sql

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 8000, seed=29)
    st = str(tmp_path / "st_tk")
    encode_dataset(src, st, mode="cluster", target_rows=500)
    recluster_store(st, "n_tok", target_rows=500)

    for q in ("SELECT doc_id, n_tok FROM store "
              "ORDER BY n_tok, doc_id LIMIT 15",
              "SELECT doc_id, n_tok FROM store "
              "ORDER BY n_tok DESC, doc_id LIMIT 9",
              "SELECT doc_id, n_tok, source FROM store WHERE source = 'web' "
              "ORDER BY n_tok DESC, doc_id LIMIT 6"):
        got = run_sql(st, q)
        exp = duckdb.sql(q.replace("FROM store", f"FROM '{src}'")).df()
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True)), q
        info = sqlmini.LAST_TOPK_INFO
        # clustered on n_tok: the greedy loop stops after the edge blocks
        assert info["blocks_decoded"] <= max(3, info["blocks_total"] // 4), \
            (q, info)

    e = explain_sql(st, "SELECT doc_id, n_tok FROM store "
                        "ORDER BY n_tok LIMIT 15")
    assert e["path"] == "order-limit-scan"
    assert e["order_limit"]["blocks_decoded_min"] <= 3

    # ORDER BY a non-selected column falls back to the generic scan —
    # and is still right
    q = "SELECT doc_id FROM store ORDER BY n_tok, doc_id LIMIT 5"
    got = run_sql(st, q)
    exp = duckdb.sql(q.replace("FROM store", f"FROM '{src}'")).df()
    assert got.equals(exp)
    assert explain_sql(st, q)["path"] == "store-scan"


def test_sql_as_of_time_travel(ray_session, tmp_path):
    """run_sql(as_of=): the whole SQL surface — metadata fast path,
    pushdown aggregate, order-limit scan, generic scan — answers against
    a retained snapshot footer instead of the live one."""
    from howard_ray.manifest import load_footer
    from howard_ray.pipeline import append_to_store

    src1 = str(tmp_path / "d1.parquet")
    src2 = str(tmp_path / "d2.parquet")
    write_corpus(src1, 1200, seed=41)
    write_corpus(src2, 800, seed=42)
    st = str(tmp_path / "st")
    encode_dataset(src1, st, mode="cluster", target_rows=400)
    snap = load_footer(st)["snapshot_id"]
    append_to_store(st, src2, mode="cluster", target_rows=400)

    # metadata fast path: COUNT as of the pre-append snapshot
    q = "SELECT COUNT(*) AS n, SUM(n_tok) AS tok FROM store"
    old = run_sql(st, q, as_of=snap)
    live = run_sql(st, q)
    exp1 = duckdb.sql(f"SELECT COUNT(*) n, SUM(n_tok) tok "
                      f"FROM '{src1}'").df()
    exp2 = duckdb.sql(f"SELECT COUNT(*) n, SUM(n_tok) tok FROM (SELECT * "
                      f"FROM '{src1}' UNION ALL SELECT * FROM '{src2}')").df()
    assert int(old["n"].iloc[0]) == int(exp1["n"].iloc[0])
    assert int(old["tok"].iloc[0]) == int(exp1["tok"].iloc[0])
    assert int(live["n"].iloc[0]) == int(exp2["n"].iloc[0])

    # pushdown aggregate + generic scan as-of
    q2 = ("SELECT COUNT(*) AS n FROM store WHERE n_tok >= 500")
    old2 = run_sql(st, q2, as_of=snap)
    exp = duckdb.sql(f"SELECT COUNT(*) n FROM '{src1}' "
                     "WHERE n_tok >= 500").df()
    assert int(old2["n"].iloc[0]) == int(exp["n"].iloc[0])

    # order-limit scan as-of (superset loop over the snapshot footer)
    q3 = ("SELECT doc_id, n_tok FROM store "
          "ORDER BY n_tok DESC, doc_id LIMIT 5")
    old3 = run_sql(st, q3, as_of=snap)
    exp3 = duckdb.sql(f"SELECT doc_id, n_tok FROM '{src1}' "
                      "ORDER BY n_tok DESC, doc_id LIMIT 5").df()
    assert old3.equals(exp3)

    # guard: as_of over a parquet table is refused
    with pytest.raises(ValueError):
        run_sql(str(tmp_path), "SELECT COUNT(*) AS n FROM documents",
                as_of=snap)


def test_sql_select_star(ray_session, tmp_path):
    """SELECT * expands to the table's (or store footer's) column order."""
    from howard_ray.sqlmini import explain_sql

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 600, seed=77)
    st = str(tmp_path / "st")
    encode_dataset(src, st, mode="stream", target_rows=300,
                   columns=["doc_id", "n_tok", "source"])

    q = "SELECT * FROM store WHERE n_tok >= 500 ORDER BY doc_id"
    got = run_sql(st, q)
    exp = duckdb.sql(
        f"SELECT doc_id, n_tok, source FROM '{src}' "
        "WHERE n_tok >= 500 ORDER BY doc_id").df()
    assert got.equals(exp), (got.columns, exp.columns)
    assert explain_sql(st, q)["columns"] == ["doc_id", "n_tok", "source"]

    # star + LIMIT over a clustered store rides the top-k scan
    from howard_ray.pipeline import recluster_store
    recluster_store(st, "n_tok", target_rows=300)
    q2 = "SELECT * FROM store ORDER BY n_tok DESC, doc_id LIMIT 4"
    got2 = run_sql(st, q2)
    exp2 = duckdb.sql(f"SELECT doc_id, n_tok, source FROM '{src}' "
                      "ORDER BY n_tok DESC, doc_id LIMIT 4").df()
    assert got2.equals(exp2)

    with pytest.raises(ValueError):
        run_sql(str(tmp_path), "SELECT * FROM orders "
                               "JOIN customer ON o_custkey = c_custkey")


def test_sql_group_by_null_keys(ray_session, tmp_path):
    """SQL keeps NULL as its own group; Ray's groupby drops null keys —
    the (filled value, isnull flag) encoding restores SQL semantics,
    including COUNT(DISTINCT) merged on the filled keys."""
    import pyarrow as pa

    from howard_ray.pipeline import append_to_store

    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    write_corpus(d1, 800, seed=71)
    t = pq.read_table(d1).slice(0, 400)
    pq.write_table(t.append_column("lang", pa.array(["en", "fr"] * 200)),
                   d2)
    st = str(tmp_path / "st")
    encode_dataset(d1, st, mode="stream", target_rows=300)
    append_to_store(st, d2, mode="stream", target_rows=300)

    q = ("SELECT lang, COUNT(*) AS n, COUNT(DISTINCT source) AS ns, "
         "SUM(n_tok) AS s FROM store GROUP BY lang ORDER BY lang")
    got = run_sql(st, q)
    exp = duckdb.sql(
        f"SELECT lang, COUNT(*) n, COUNT(DISTINCT source) ns, "
        f"SUM(n_tok) s FROM (SELECT NULL AS lang, source, n_tok FROM "
        f"'{d1}' UNION ALL SELECT lang, source, n_tok FROM '{d2}') "
        "GROUP BY lang ORDER BY lang").df()
    assert got["lang"].tolist()[:2] == exp["lang"].tolist()[:2]
    assert got["lang"].isna().tolist() == exp["lang"].isna().tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["ns"].tolist() == exp["ns"].tolist()
    assert got["s"].tolist() == [int(x) for x in exp["s"]]


def test_cte_over_store(ray_session, tmp_path):
    """WITH bodies can read FROM store: the CTE scratch dir mirrors the
    full store layout (round-3 verify-drive catch)."""
    from howard_ray.fixtures import write_corpus
    from howard_ray.pipeline import encode_dataset
    from howard_ray.sqlmini import run_sql

    src = str(tmp_path / "c.parquet")
    write_corpus(src, 1200, seed=5)
    store = str(tmp_path / "st")
    encode_dataset(src, store, mode="stream", target_rows=400)
    out = run_sql(store, "WITH s AS (SELECT source, n_tok FROM store) "
                         "SELECT source, COUNT(*) AS n, "
                         "ROUND(SUM(n_tok), 2) AS tok FROM s "
                         "GROUP BY source ORDER BY source")
    import duckdb
    want = duckdb.sql(
        f"SELECT source, COUNT(*) AS n, ROUND(SUM(n_tok), 2) AS tok "
        f"FROM '{src}' GROUP BY source ORDER BY source").df()
    import pandas as pd
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)
