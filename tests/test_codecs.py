"""Codec round-trip unit tests (no Ray needed).

Reference test style: inline golden assertions per operator
(/root/reference/tests/test_variants_annotations_parquet.py:75-101); here the
invariant is decode(encode(x)) bit-identical (BASELINE.json input_hint).
"""

import numpy as np
import pyarrow as pa
import pytest

from howard_ray.codecs import (
    FsstNotApplicable,
    decode_ints,
    decode_strings,
    encode_ints,
    encode_strings,
    fsst_decode,
    fsst_encode,
    pack_bits,
    unpack_bits,
)

rng = np.random.default_rng(42)

INT_ARRAYS = [
    np.arange(1000, dtype=np.int32),
    rng.integers(0, 50257, 10_000).astype(np.int32),
    np.zeros(500, dtype=np.int32),
    np.array([7], dtype=np.int32),
    np.array([], dtype=np.int32),
    np.repeat(rng.integers(0, 50, 40), rng.integers(1, 30, 40)).astype(np.int32),
    rng.integers(-(2**31), 2**31 - 1, 5000).astype(np.int32),
    np.array([np.iinfo(np.int32).min, np.iinfo(np.int32).max], dtype=np.int32),
    np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0], dtype=np.int64),
    np.cumsum(rng.integers(0, 4096, 2000)).astype(np.int64),  # offsets-like
]


@pytest.mark.parametrize("width", [0, 1, 3, 8, 13, 17, 32, 57, 63])
def test_pack_bits_roundtrip(width):
    n = 777
    vals = rng.integers(0, 2**width if width else 1, n, dtype=np.uint64) if width else np.zeros(n, np.uint64)
    out = unpack_bits(pack_bits(vals, width), n, width)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("codec", ["plain", "for_bitpack", "for_bytes",
                                   "for_split", "delta_bitpack", "rle_bitpack"])
@pytest.mark.parametrize("i", range(len(INT_ARRAYS)))
def test_int_roundtrip(codec, i):
    arr = INT_ARRAYS[i]
    payload, meta = encode_ints(arr, codec)
    out = decode_ints(payload, meta)
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_constant_codec():
    arr = np.full(10_000, 42, dtype=np.int32)
    payload, meta = encode_ints(arr, "constant")
    assert payload == b""
    np.testing.assert_array_equal(decode_ints(payload, meta), arr)
    with pytest.raises(ValueError):
        encode_ints(np.array([1, 2]), "constant")


def test_rle_beats_plain_on_runs():
    arr = np.repeat(np.arange(100, dtype=np.int32), 1000)
    p_rle, _ = encode_ints(arr, "rle_bitpack", post_zstd=False)
    p_plain, _ = encode_ints(arr, "plain", post_zstd=False)
    assert len(p_rle) < len(p_plain) / 50


STRING_ARRAYS = [
    ["web/doc-%012d" % i for i in range(2000)],
    ["web", "books", "code"] * 700,
    [""],
    [],
    ["", "a", "", "bb", ""],
    ["héllo wörld", "日本語テキスト", "emoji 🎉🎉"] * 10,
]


@pytest.mark.parametrize("codec", ["plain_str", "dict_str"])
@pytest.mark.parametrize("i", range(len(STRING_ARRAYS)))
def test_str_roundtrip(codec, i):
    arr = pa.array(STRING_ARRAYS[i], type=pa.string())
    payload, meta = encode_strings(arr, codec)
    out = decode_strings(payload, meta)
    assert out.to_pylist() == STRING_ARRAYS[i]


def test_fsst_roundtrip_and_ratio():
    docs = ["web/doc-%012d" % i for i in range(5000)]
    payload, meta = fsst_encode([d.encode() for d in docs], post_zstd=False)
    out = fsst_decode(payload, meta)
    assert [b.decode() for b in out] == docs
    raw = sum(len(d) for d in docs)
    assert len(payload) < raw * 0.7  # symbol table must actually compress


def test_fsst_via_dispatch():
    arr = pa.array(["code/doc-%09d" % (i * 7) for i in range(1000)])
    payload, meta = encode_strings(arr, "fsst")
    out = decode_strings(payload, meta)
    assert out.to_pylist() == arr.to_pylist()


def test_fsst_not_applicable_on_dense_alphabet():
    data = [bytes(range(256))] * 10
    with pytest.raises(FsstNotApplicable):
        fsst_encode(data, post_zstd=False)


def test_str_sliced_array_roundtrip():
    base = pa.array(["x/%06d" % i for i in range(100)])
    sl = base.slice(20, 50)
    payload, meta = encode_strings(sl, "plain_str")
    assert decode_strings(payload, meta).to_pylist() == sl.to_pylist()


# --- float codecs (plain_float / bss_float byte-stream-split) ---

from howard_ray.codecs import decode_floats, encode_floats  # noqa: E402

FLOAT_ARRAYS = [
    rng.normal(size=5000).astype(np.float32),
    rng.normal(size=5000).astype(np.float64),
    (rng.integers(0, 255, 4096) / 8.0).astype(np.float32),  # quantized-ish
    np.zeros(300, dtype=np.float32),
    np.array([1.5], dtype=np.float64),
    np.array([], dtype=np.float32),
    np.array([np.nan, np.inf, -np.inf, -0.0, 0.0,
              np.finfo(np.float32).tiny, np.finfo(np.float32).max],
             dtype=np.float32),
]


@pytest.mark.parametrize("codec", ["plain_float", "bss_float"])
@pytest.mark.parametrize("i", range(len(FLOAT_ARRAYS)))
def test_float_roundtrip_bit_identical(codec, i):
    vals = FLOAT_ARRAYS[i]
    payload, meta = encode_floats(vals, codec)
    out = decode_floats(payload, meta)
    assert out.dtype == vals.dtype
    # bit-level equality (NaN payloads, signed zeros) — not value equality
    assert np.array_equal(vals.view(np.uint8), out.view(np.uint8))


def test_bss_beats_plain_on_structured_floats():
    # same-magnitude floats: sign/exponent planes are near-constant under BSS
    vals = (1.0 + rng.random(50_000) * 1e-3).astype(np.float32)
    p_bss, _ = encode_floats(vals, "bss_float")
    p_plain, _ = encode_floats(vals, "plain_float")
    assert len(p_bss) < len(p_plain)


def test_float_selector_and_block_kinds():
    from howard_ray.block import decode_block, encode_block
    from howard_ray.selector import choose_float_codec

    vals = rng.normal(size=4096).astype(np.float32)
    assert choose_float_codec(vals) in ("bss_float", "plain_float")
    emb = pa.array([[float(x) for x in rng.normal(size=16)] for _ in range(200)],
                   type=pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(range(200), type=pa.int64()),
                  "embedding": emb,
                  "score": pa.array(rng.normal(size=200), type=pa.float64())})
    data, meta = encode_block(t, "b0")
    kinds = {c: e["kind"] for c, e in meta["columns"].items()}
    assert kinds == {"vec_id": "int", "embedding": "list_float", "score": "float"}
    assert decode_block(data).equals(t)


def test_uint64_frame_of_reference_roundtrip():
    """uint64 values above 2^63 must round-trip bit-exact through every
    FOR codec: the wrapped-int64 reference keeps the decode add in
    mod-2^64 integer arithmetic (a Python-int reference silently promoted
    the add to float64 and collapsed every value to the reference)."""
    import numpy as np

    from howard_ray.codecs import decode_ints, encode_ints

    v = np.array([2**63 + 5, 2**63 + 1, 2**63 + 100, 2**64 - 1],
                 dtype=np.uint64)
    full = np.array([0, 2**64 - 1, 5], dtype=np.uint64)  # 64-bit span
    for codec in ("for_bytes", "for_split", "for_bitpack"):
        for arr in (v, full):
            p, m = encode_ints(arr, codec)
            d = decode_ints(p, m)
            assert d.dtype == np.uint64 and (d == arr).all(), (codec, d)


def test_zone_sum_overflow_free():
    import numpy as np
    import pyarrow as pa

    from howard_ray.block import _exact_int_sum, encode_block, \
        read_block_meta

    assert _exact_int_sum(np.full(1000, 2**62, dtype=np.int64)) == \
        1000 * 2**62
    assert _exact_int_sum(np.array([2**63, 2**63 + 2],
                                   dtype=np.uint64)) == 2**64 + 2
    t = pa.table({"h": pa.array(np.array([2**63 + 5, 2**63 + 1],
                                         dtype=np.uint64))})
    b, _ = encode_block(t, "blk")
    st = read_block_meta(b)["columns"]["h"]["stats"]
    assert st["sum"] == 2**64 + 6


def test_fsst_sample_divergence_falls_back():
    """A column whose ~1% selector sample looks fsst-able but whose full
    byte histogram lacks free code bytes must encode (plain fallback),
    not crash the block task."""
    import random

    import pyarrow as pa

    from howard_ray.block import decode_block, encode_block

    rows = ["the quick brown fox jumps over the lazy dog " * 3] * 50000
    rng = random.Random(7)
    alpha = [chr(c) for c in range(33, 0x2FF) if chr(c).isprintable()]
    for i in range(300):  # diversity OUTSIDE the middle sample window
        rows[i] = "".join(rng.choice(alpha) for _ in range(400))
    b, _ = encode_block(pa.table({"s": pa.array(rows)}), "blk")
    assert decode_block(b)["s"].to_pylist() == rows


def test_read_block_meta_checks_magic():
    import pytest

    from howard_ray.block import read_block_meta

    with pytest.raises(ValueError, match="magic"):
        read_block_meta(b"JUNKJUNKJUNKJUNK")
