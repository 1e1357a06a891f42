"""Property-based round-trip tests (hypothesis) — beyond the reference's
inline-golden style (SURVEY.md §5: "no property-based testing" — we add it
because bit-identical round-trip is the engine's core invariant)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from howard_ray.block import decode_block, encode_block
from howard_ray.codecs import decode_ints, decode_strings, encode_ints, encode_strings

signed_arrays = arrays(
    dtype=st.sampled_from([np.int32, np.int64]),
    shape=st.integers(0, 2000),
    elements=st.integers(-2**31, 2**31 - 1),
)
unsigned_arrays = arrays(
    dtype=st.just(np.uint32),
    shape=st.integers(0, 2000),
    elements=st.integers(0, 2**32 - 1),
)
int_arrays = st.one_of(signed_arrays, unsigned_arrays)


@settings(max_examples=40, deadline=None)
@given(arr=int_arrays,
       codec=st.sampled_from(["plain", "for_bitpack", "for_bytes", "for_split",
                              "delta_bitpack", "rle_bitpack"]))
def test_int_codec_roundtrip_property(arr, codec):
    payload, meta = encode_ints(arr, codec)
    out = decode_ints(payload, meta)
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


@settings(max_examples=30, deadline=None)
@given(strings=st.lists(st.text(max_size=40), max_size=300),
       codec=st.sampled_from(["plain_str", "dict_str"]))
def test_str_codec_roundtrip_property(strings, codec):
    arr = pa.array(strings, type=pa.string())
    payload, meta = encode_strings(arr, codec)
    assert decode_strings(payload, meta).to_pylist() == strings


@settings(max_examples=15, deadline=None)
@given(lists=st.lists(st.lists(st.integers(-2**31, 2**31 - 1), max_size=50),
                      min_size=1, max_size=100))
def test_block_list_column_roundtrip_property(lists):
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lists))]),
        "tokens": pa.array(lists, type=pa.list_(pa.int32())),
    })
    data, _ = encode_block(t, "b")
    out = decode_block(data)
    assert out["tokens"].combine_chunks().equals(t["tokens"].combine_chunks())
    assert out["doc_id"].combine_chunks().equals(t["doc_id"].combine_chunks())


def test_layout_variants_roundtrip_and_codecs():
    """FIXTURES.md sort/layout variants: sorted-by-source favors dict/runs,
    shuffled favors bitpack — and both round-trip bit-identically."""
    from howard_ray.fixtures import make_tokens_corpus

    for variant in ["sorted_by_source", "shuffled"]:
        t = make_tokens_corpus(3000, seed=7, variant=variant)
        data, meta = encode_block(t, variant)
        out = decode_block(data)
        for c in t.column_names:
            assert out[c].combine_chunks().equals(
                t[c].combine_chunks()), (variant, c)
    # sorted-by-source: the source column is run-heavy; dict or rle must win
    t = make_tokens_corpus(3000, seed=7, variant="sorted_by_source")
    _, meta = encode_block(t, "s")
    assert meta["columns"]["source"]["meta"]["codec"] in ("dict_str", "fsst")


@settings(max_examples=30, deadline=None)
@given(strings=st.lists(st.text(min_size=0, max_size=40), min_size=1,
                        max_size=20))
def test_horner_hash_matches_duckdb_expression(strings):
    """The Horner byte-polynomial hash — the foundation of the
    fingerprints / MinHash / SimHash SQL oracles — must agree with its
    DuckDB HUGEINT expression on arbitrary unicode (incl. multibyte)."""
    import duckdb

    from howard_ray.ops.text import horner_hash_u64

    got = horner_hash_u64(strings)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(strings)))
    exp = con.execute("""
      WITH hx AS (
        SELECT i, hex(encode(s)) AS h, octet_length(encode(s)) AS n FROM t)
      SELECT i, list_reduce(
        list_prepend(0::HUGEINT,
          list_transform(range(n - 1, -1, -1),
            j -> ((strpos('0123456789ABCDEF', h[2*j+1:2*j+1]) - 1) * 16
                 + (strpos('0123456789ABCDEF', h[2*j+2:2*j+2]) - 1))::HUGEINT)),
        (acc, b) -> (acc * 1099511628211 + b)
                    % 18446744073709551616::HUGEINT) AS u
      FROM hx ORDER BY i""").fetchall()
    for (i, u), g in zip(exp, got):
        assert int(u) == int(g), (strings[i], u, g)
