"""Round-5 verdict item #6: ANN recall targets hold as the embeddings
corpus grows 5x and the scale-derived knobs (_lsh_params planes/tables,
IVF nlist) deepen. The 5x corpus keeps the fixture's distribution
(random unit vectors) with fresh deterministic draws, so neighbor
structure stays near-orthogonal — the hard case for any partitioner."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def big_dir(tmp_path_factory):
    src = "/root/testdata/sf0.1/embeddings.parquet"
    t = pq.read_table(src)
    dim = len(t["embedding"][0])
    n = t.num_rows
    rng = np.random.default_rng(73)
    parts = [t]
    for r in range(1, 5):
        v = rng.standard_normal((n, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        parts.append(pa.table({
            "vec_id": pa.array(np.asarray(t["vec_id"]) + r * 1_000_000),
            "embedding": pa.array(list(v)),
            "label": t["label"]}))
    d = tmp_path_factory.mktemp("ann5x")
    big = pa.concat_tables(parts, promote_options="default")
    pq.write_table(big, str(d / "embeddings.parquet"))
    return str(d)


def test_ann_recall_holds_at_5x_corpus(ray_session, big_dir):
    from howard_ray.ops.similarity import (LSH_TARGET_RECALL, _ivf_params,
                                           _lsh_params, ann_recall)

    n1 = pq.ParquetFile(
        "/root/testdata/sf0.1/embeddings.parquet").metadata.num_rows
    # the knobs actually deepen at 5x
    assert _ivf_params(5 * n1)[0] > _ivf_params(n1)[0]
    # LSH planes step on powers of two: monotone at 5x, strict by 100x
    assert _lsh_params(5 * n1)[0] >= _lsh_params(n1)[0]
    assert _lsh_params(100 * n1)[0] > _lsh_params(n1)[0]

    rec = ann_recall(big_dir).set_index("method")["recall_at_k"]
    assert rec["lsh"] >= LSH_TARGET_RECALL - 0.1, rec
    assert rec["ivf"] >= 0.8, rec
    assert rec["pq"] >= 0.8, rec
