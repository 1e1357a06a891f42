"""Unit tests for operator internals: rule-engine modes, calculations
compiler, cogroup join with skewed keys, FSST invertibility edge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_rule_engine_varank_max_mode():
    from howard_ray.ops.rules import compile_profile

    profile = [
        {"field": "x", "type": "gt", "value": 5, "score": 2, "flag": True},
        {"field": "x", "type": "gt", "value": 8, "score": 7, "flag": True},
    ]
    batch = pa.table({"doc_id": ["a", "b", "c"], "x": [3, 6, 9]})
    howard = compile_profile(profile)(batch)
    assert howard["pzscore"].to_pylist() == [0, 2, 9]  # accumulate
    varank = compile_profile(profile, mode="vvarank")(batch)
    assert varank["pzscore"].to_pylist() == [0, 2, 7]  # max


def test_rule_engine_flag_and():
    from howard_ray.ops.rules import compile_profile

    profile = [{"field": "x", "type": "gte", "value": 5, "score": 0, "flag": False}]
    batch = pa.table({"doc_id": ["a", "b"], "x": [3, 7]})
    out = compile_profile(profile)(batch)
    assert out["pzflag"].to_pylist() == [0, 1]


def test_calculations_compiler_ops():
    from howard_ray.plugins import compile_calculations

    specs = [
        {"name": "s", "op": "add", "args": ["a", {"const": 10}]},
        {"name": "p", "op": "round", "ndigits": 1,
         "args": [{"op": "mul", "args": ["a", {"const": 0.5}]}]},
        {"name": "c", "op": "concat", "args": ["name", {"const": "!"}]},
        {"name": "l", "op": "length", "args": ["name"]},
    ]
    batch = pa.table({"a": [1.0, 3.0], "name": ["x", "yy"]})
    out = compile_calculations(specs)(batch)
    assert out["s"].to_pylist() == [11.0, 13.0]
    assert out["p"].to_pylist() == [0.5, 1.5]
    assert out["c"].to_pylist() == ["x!", "yy!"]
    assert out["l"].to_pylist() == [1, 2]


def test_cogroup_join_with_skewed_key(ray_session):
    import ray.data as rd

    from howard_ray.ops.relational import cogroup_join

    # hot key 7 holds 90% of the left side
    left = pd.DataFrame({"k": [7] * 900 + list(range(100)), "v": 1.0})
    right = pd.DataFrame({"k": list(range(100)), "w": 2.0})

    def merge(l, r):
        m = l.merge(r, on="k")
        return m.groupby("k", as_index=False).agg(n=("v", "size"))

    out = (cogroup_join(rd.from_pandas(left), rd.from_pandas(right), "k", "k",
                        merge, num_buckets=8)
           .to_pandas().groupby("k", as_index=False).agg(n=("n", "sum")))
    got = dict(zip(out["k"], out["n"]))
    assert got[7] == 901  # 900 dupes + the one in range(100)
    assert got[3] == 1
    assert len(got) == 100


def test_plugin_discovery():
    from howard_ray.plugins import discover_plugins

    reg = discover_plugins()
    assert "plugin_minimalize" in reg.queries
    assert "plugin_minimalize" in reg.oracle_sql


def test_fsst_handles_code_byte_absent_from_symbols():
    """Symbols must never contain code bytes: construct strings whose
    frequent substrings would collide if codes were drawn from used bytes."""
    from howard_ray.codecs import fsst_decode, fsst_encode

    strings = [b"abcabcabc" * 5, b"bcabca" * 7, b"cab" * 11] * 50
    payload, meta = fsst_encode(strings, post_zstd=False)
    assert fsst_decode(payload, meta) == strings
    used = set(b"".join(strings))
    for _, code in meta["symbols"]:
        assert code not in used


def test_simhash_neardup_complete_vs_bruteforce(ray_session):
    """The 4x16-bit pigeonhole banding must find EXACTLY the pairs a
    brute-force all-pairs Hamming scan finds at threshold 3 (the banding is
    complete for d <= 3, not probabilistic)."""
    import numpy as np

    from howard_ray.ops.dedup import (SIMHASH_HAMMING_T, SimHasher,
                                      simhash_neardup)
    from howard_ray.ops.util import tbl

    sf = "/root/testdata/sf0.001"
    banded = simhash_neardup(sf)
    docs = tbl(sf, "documents", ["doc_id", "text"]).to_pandas()
    sh = SimHasher()(docs)
    ids = sh["doc_id"].to_numpy()
    h = sh["simhash"].to_numpy().view(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = np.unpackbits((h[ii] ^ h[jj]).view(np.uint8).reshape(-1, 8),
                        axis=1).sum(axis=1)
    keep = ham <= SIMHASH_HAMMING_T
    brute = set(zip(np.minimum(ids[ii], ids[jj])[keep],
                    np.maximum(ids[ii], ids[jj])[keep]))
    got = set(zip(banded["doc_a"], banded["doc_b"]))
    assert got == brute


def test_fingerprints_deterministic(ray_session):
    from howard_ray.ops.text import fingerprints

    a = fingerprints("/root/testdata/sf0.001")
    b = fingerprints("/root/testdata/sf0.001")
    assert (a["fingerprint"] == b["fingerprint"]).all()


def test_sqlmini_parser_and_errors(ray_session):
    import pytest as _pytest

    from howard_ray.sqlmini import parse, run_sql

    p = parse("SELECT a, COUNT(*) AS n, ROUND(SUM(b), 2) AS s FROM t "
              "WHERE c >= 5 AND d LIKE '%x%' GROUP BY a ORDER BY a DESC LIMIT 3")
    assert p["table"] == "t" and p["limit"] == 3
    assert p["items"][2]["agg"] == "SUM" and p["items"][2]["nd"] == 2
    assert p["conds"][1]["op"] == "LIKE"
    assert p["order"] == [("a", True)]
    p2 = parse("SELECT a, COUNT(DISTINCT b) AS nb FROM t GROUP BY a "
               "HAVING nb >= 2 ORDER BY a")
    assert p2["items"][1]["distinct"] and p2["having"][0]["op"] == ">="
    # ORDER BY an aggregate alias must not leak into the pruned read
    out2 = run_sql("/root/testdata/sf0.001",
                   "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                   "GROUP BY o_orderpriority ORDER BY n DESC LIMIT 2")
    assert list(out2.columns) == ["o_orderpriority", "n"]
    assert out2["n"].is_monotonic_decreasing
    for bad in ("DELETE FROM t", "SELECT a FROM t JOIN u ON 1=1",
                "SELECT ROUND(SUM(b)) AS s FROM t",
                "SELECT SUM(DISTINCT b) AS s FROM t",
                "SELECT a FROM t HAVING a > 1"):
        if bad == "SELECT a FROM t HAVING a > 1":
            with _pytest.raises(ValueError):
                run_sql("/root/testdata/sf0.001", bad.replace("t", "orders")
                        .replace(" a ", " o_orderkey "))
            continue
        with _pytest.raises(ValueError):
            parse(bad)
    # empty result keeps schema
    out = run_sql("/root/testdata/sf0.001",
                  "SELECT o_orderkey, o_totalprice FROM orders "
                  "WHERE o_totalprice >= 99999999 ORDER BY o_orderkey")
    assert list(out.columns) == ["o_orderkey", "o_totalprice"] and len(out) == 0


def test_external_gzip_stage(ray_session):
    """External-tool actor stage (gzip shell-out): runs, compresses, and is
    deterministic across invocations (fixed chunking + scan order)."""
    from howard_ray.ops.external import external_gzip_compress

    a = external_gzip_compress("/root/testdata/sf0.001")
    b = external_gzip_compress("/root/testdata/sf0.001")
    assert a["gz_bytes"][0] > 0
    assert a["gz_bytes"][0] < a["raw_bytes"][0]
    assert a.equals(b)


def test_pack_spans_bucket_invariance(ray_session):
    """The pack assignment is a pure function of (key, doc order, n) — the
    bucket size is only a partitioning device and must not change results."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from howard_ray.ops.tokens import pack_spans

    rng = __import__("numpy").random.default_rng(11)
    n = 400
    t = pa.table({
        "k": pa.array(["a" if i % 3 else "b" for i in range(n)]),
        "i": pa.array(list(range(n)), type=pa.int64()),
        "n": pa.array(rng.integers(1, 300, n), type=pa.int64()),
    })
    ds = ray.data.from_arrow(t)

    def run(bucket):
        out = pack_spans(ds, key_col="k", id_col="i", n_col="n",
                         ctx=256, bucket_size=bucket).to_pandas()
        return out.sort_values(["k", "pack_id"]).reset_index(drop=True)

    a, b, c = run(7), run(64), run(100000)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    # conservation: total packed tokens == total input tokens per key
    tot = a.groupby("k")["n_tokens"].sum().to_dict()
    import numpy as np
    arr_k = np.array(t["k"])
    arr_n = np.array(t["n"])
    for key in ("a", "b"):
        assert tot[key] == int(arr_n[arr_k == key].sum())
    # every non-final pack is exactly full
    for key, g in a.groupby("k"):
        assert (g["n_tokens"].iloc[:-1] == 256).all()


def test_decontaminate_flags_real_overlaps(ray_session):
    from howard_ray.ops.tokens import decontaminate

    out = decontaminate("/root/testdata/sf0.001")
    assert list(out.columns) == ["doc_id", "n_gram_hits"]
    assert (out["n_gram_hits"] >= 1).all()
    assert (out["doc_id"] % 13 != 0).all()


def test_token_bigrams_top100(ray_session):
    from howard_ray.ops.tokens import token_bigrams

    out = token_bigrams("/root/testdata/sf0.001")
    assert len(out) == 100
    assert (out["cnt"].diff().dropna() <= 0).all()


def test_minhash_candidate_recall(ray_session):
    """LSH candidate set must contain every true near-dup pair at
    Jaccard >= 0.9 (16 bands x 4 rows: per-pair miss prob < 1e-7) —
    the recall guarantee the near-dup pipeline's verify stage relies on."""
    from howard_ray.ops.dedup import dedup_jaccard_join, dedup_minhash_candidates

    sf = "/root/testdata/sf0.001"
    truth = dedup_jaccard_join(sf)
    high = truth[truth["jaccard"] >= 0.9]
    assert len(high) > 0, "fixture must contain high-similarity pairs"
    cand = dedup_minhash_candidates(sf)
    cand_pairs = set(zip(cand["doc_a"], cand["doc_b"]))
    missing = [p for p in zip(high["doc_a"], high["doc_b"])
               if p not in cand_pairs]
    assert not missing, f"LSH missed high-Jaccard pairs: {missing[:5]}"


def test_jaccard_prefix_filter_bound():
    """Prefix filtering (round-3): the join input per doc is bounded by
    floor((1-tau)*n)+1 — the positional prefix — and the filtered chain
    still returns the exact pair set (oracle equality is asserted in
    test_ops_oracle; here we assert the bound itself)."""
    import numpy as np
    import pyarrow.parquet as pq

    from howard_ray.ops.dedup import (JACCARD_THRESHOLD, _distinct_per_doc,
                                      _prefix_len, _shingle_hash_arrays)

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    texts = t["text"].to_pylist()
    d, g = _distinct_per_doc(*_shingle_hash_arrays(texts))
    sizes = np.bincount(d, minlength=len(texts))
    p = _prefix_len(sizes)
    bound = np.floor((1 - JACCARD_THRESHOLD) * sizes).astype(np.int64) + 1
    assert (p <= bound).all()
    assert (p[sizes > 0] >= 1).all()
    # the prefix materially shrinks the join input on real data
    assert p.sum() < 0.55 * sizes.sum()


def test_shingle_hash_arrays_match_string_shingles():
    """The vectorized width-seeded hash combine is set-equivalent to the
    string shingles: per-doc distinct counts and pairwise intersections
    agree with the Python-set reference on the fixture corpus."""
    import numpy as np
    import pyarrow.parquet as pq

    from howard_ray.ops.dedup import (_distinct_per_doc, _shingle_hash_arrays,
                                      _shingles)

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    texts = t["text"].to_pylist()[:200] + ["", "one", "two words"]
    d, g = _distinct_per_doc(*_shingle_hash_arrays(texts))
    sizes = np.bincount(d, minlength=len(texts))
    ref = [set(_shingles(tx.split(" "))) for tx in texts]
    assert sizes.tolist() == [len(s) for s in ref]
    starts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    # spot-check intersections on consecutive doc pairs
    for i in range(0, len(texts) - 1, 7):
        a = g[starts[i]:starts[i] + sizes[i]]
        b = g[starts[i + 1]:starts[i + 1] + sizes[i + 1]]
        inter = np.intersect1d(a, b, assume_unique=True).size
        assert inter == len(ref[i] & ref[i + 1])


def test_derived_bucket_counts_grow_with_input(ray_session):
    """Round-5 verdict item #1: grouped-fold bucket counts are a function
    of input size (bounded per-task bytes), not constants."""
    from howard_ray.ops.curate import n_shards_for, SHARD_CHAR_TARGET
    from howard_ray.ops.util import derive_buckets

    assert derive_buckets(0) >= 16                  # parallelism floor
    a, b, c = (derive_buckets(1 << 30), derive_buckets(1 << 36),
               derive_buckets(1 << 44))
    assert a < b < c                                # grows with bytes
    assert b == (1 << 36) // (64 << 20)             # 64 MB per task
    assert derive_buckets(1 << 52) == 1 << 20       # cap
    # pow2 rounding: near-identical inputs derive identical counts
    assert derive_buckets(1 << 36) == derive_buckets((1 << 36) - 5)
    # training-shard sizing (shared formula with the SQL twin)
    assert n_shards_for(0) == 16
    assert n_shards_for(SHARD_CHAR_TARGET * 1000) == 1000
    assert n_shards_for(10 ** 18) == 1 << 20


def test_dedup_exact_bucket_invariance(ray_session):
    """Fold results are bucket-count-invariant: the derived count only
    partitions work."""
    import pandas as pd

    from howard_ray.ops.dedup import dedup_exact

    a = dedup_exact("/root/testdata/sf0.001", n_buckets=8)
    b = dedup_exact("/root/testdata/sf0.001", n_buckets=333)
    pd.testing.assert_frame_equal(a, b)
