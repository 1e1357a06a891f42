"""Storage-partitioned join (howard_ray.spj): zero-shuffle join of two
stores clustered on the key — metadata-planned block pairs, driver-side
pruning of non-intersecting blocks, tombstone honoring, honest refusal
when a side is unclustered."""

import os

import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from howard_ray import spj
from howard_ray.fixtures import write_corpus
from howard_ray.pipeline import (delete_where, encode_dataset,
                                 recluster_store)
from howard_ray.spj import join_clustered


def _two_stores(tmp_path, n=4000):
    src = str(tmp_path / "c.parquet")
    write_corpus(src, n, seed=19)
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    encode_dataset(src, sa, mode="stream", target_rows=500,
                   columns=["doc_id", "n_tok"])
    encode_dataset(src, sb, mode="stream", target_rows=800,
                   columns=["doc_id", "source"])
    recluster_store(sa, "doc_id", target_rows=500)
    recluster_store(sb, "doc_id", target_rows=800)
    return src, sa, sb


def test_spj_exact_and_planned(ray_session, tmp_path):
    src, sa, sb = _two_stores(tmp_path)
    df = join_clustered(sa, sb, "doc_id", columns_a=["n_tok"],
                        columns_b=["source"]).to_pandas()
    exp = duckdb.sql(f"SELECT COUNT(*) n, SUM(n_tok) s FROM '{src}'").df()
    assert len(df) == int(exp["n"].iloc[0])
    assert int(df["n_tok"].sum()) == int(exp["s"].iloc[0])
    info = spj.LAST_SPJ_INFO
    # clustered sides: far fewer pairs than the |A|*|B| cross product
    assert info["block_pairs"] < info["a_blocks"] * info["b_blocks"] / 2

    g = df.groupby("source")["n_tok"].sum().sort_index()
    expg = duckdb.sql(f"SELECT source, SUM(n_tok) s FROM '{src}' "
                      "GROUP BY source ORDER BY source").df()
    assert [int(x) for x in g] == [int(x) for x in expg["s"]]


def test_spj_delta_prunes_blocks(ray_session, tmp_path):
    """A narrow delta side prunes most of the other side's blocks at the
    driver — the delta ⋈ reference shape."""
    src, sa, sb = _two_stores(tmp_path)
    # narrow A: encode only a small doc_id band as the 'delta' store
    t = pq.read_table(src, columns=["doc_id", "n_tok"])
    t = t.filter(pc.match_substring(t["doc_id"], "/doc-0000000001"))
    delta_src = str(tmp_path / "delta.parquet")
    pq.write_table(t, delta_src)
    sd = str(tmp_path / "sd")
    encode_dataset(delta_src, sd, mode="stream", target_rows=300)
    recluster_store(sd, "doc_id", target_rows=300)

    df = join_clustered(sd, sb, "doc_id", columns_a=["n_tok"],
                        columns_b=["source"]).to_pandas()
    assert len(df) == t.num_rows
    info = spj.LAST_SPJ_INFO
    assert info["block_pairs"] <= info["b_blocks"]  # touched a fraction


def test_spj_tombstones_and_refusal(ray_session, tmp_path):
    src, sa, sb = _two_stores(tmp_path, n=2000)
    delete_where(sb, ("source", "==", "web"))
    df = join_clustered(sa, sb, "doc_id", columns_a=["n_tok"],
                        columns_b=["source"]).to_pandas()
    exp = duckdb.sql(f"SELECT COUNT(*) FROM '{src}' "
                     "WHERE source != 'web'").fetchone()[0]
    assert len(df) == exp and (df["source"] != "web").all()

    sc = str(tmp_path / "sc")
    encode_dataset(src, sc, mode="stream", target_rows=500,
                   columns=["doc_id", "source"])
    with pytest.raises(ValueError, match="not clustered"):
        join_clustered(sa, sc, "doc_id")
    # explicit opt-in accepts the quadratic fallback and stays correct
    df2 = join_clustered(sa, sc, "doc_id", columns_a=["n_tok"],
                         columns_b=["source"],
                         require_clustered=False).to_pandas()
    assert len(df2) == 2000
