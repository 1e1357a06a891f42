"""Integer-array codecs: plain / constant / frame-of-reference+bit-pack /
delta+zigzag+bit-pack / run-length+bit-pack, all with opportunistic zstd
post-compression.

These are the lightweight per-column codecs the north rule requires for the
``tokens`` (list<int32> values), ``n_tok`` and list-offset columns. Pure
NumPy, no per-value Python loops. Every codec is exactly invertible
(bit-identical round-trip), mirroring the reference's "typed column ↔ packed
representation" invariant (reference explode/pack passes,
howard/objects/variants.py:1771-1986 and :8465-8481) at the buffer level.

Meta dicts are JSON-serializable so they can live in the block footer
(the analog of the reference's ``.hdr`` sidecar schema,
howard/objects/variants.py:2351-2444).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width, pack_bits, unpack_bits
from .zstd import maybe_post_compress, maybe_post_decompress

INT_CODECS = ("plain", "constant", "for_bitpack", "for_bytes", "for_split",
              "delta_bitpack", "rle_bitpack")


def _as_i64(vals: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(vals, dtype=np.int64)


def _for_reduce(vals: np.ndarray):
    """(reduced unsigned-castable array, lo, width) for frame-of-reference
    codecs, computed in the input's NATIVE dtype whenever the span fits —
    the int64 widening copy + 64-bit subtract roughly doubles the byte
    codecs' memory traffic, and memory traffic (not ALU) is what prices
    these kernels under full-node concurrency (BASELINE.md: 32 concurrent
    encoders inflate per-task CPU 14x on the sandbox host). Returns
    (None, lo, w) when the span exceeds 63 bits (caller degrades to
    plain)."""
    v = np.ascontiguousarray(vals)
    lo = int(v.min())
    hi = int(v.max())
    w = bit_width(hi - lo)
    if w > 63:
        return None, lo, w
    if v.dtype.kind in "iu" and v.dtype.itemsize <= 8 \
            and hi - lo <= np.iinfo(v.dtype).max:
        r = v - v.dtype.type(lo)     # native-width subtract, exact
    else:
        r = _as_i64(v) - np.int64(lo)
    if lo >= 2 ** 63:
        # uint64 reference above int64 range: store the WRAPPED int64
        # residue — decode adds in int64 (mod 2^64) and the final
        # astype back to uint64 restores the exact value; the unwrapped
        # Python int would silently promote the decode add to float64
        # and collapse every value to the rounded reference
        lo -= 2 ** 64
    return r, lo, w


def encode_ints(vals: np.ndarray, codec: str, post_zstd: bool = True) -> tuple[bytes, dict]:
    """Encode an integer ndarray with the named codec → (payload, meta)."""
    vals = np.asarray(vals)
    if vals.dtype.kind not in "iu":
        raise TypeError(f"int codec on dtype {vals.dtype}")
    meta: dict = {"codec": codec, "n": int(vals.size), "dtype": vals.dtype.str}
    if vals.size == 0:
        meta["codec"] = "constant"
        meta["value"] = 0
        return b"", meta

    if codec == "constant":
        v0 = int(vals[0])
        if not bool(np.all(vals == vals[0])):
            raise ValueError("constant codec on non-constant array")
        meta["value"] = v0
        return b"", meta

    if codec == "plain":
        payload = _as_i64(vals).tobytes() if vals.dtype.itemsize != 8 else np.ascontiguousarray(vals).tobytes()
        meta["plain_dtype"] = "<i8" if vals.dtype.itemsize != 8 else vals.dtype.str
    elif codec == "for_bitpack":
        payload = _encode_for(vals, meta)
    elif codec == "for_bytes":
        payload = _encode_for_bytes(vals, meta)
    elif codec == "for_split":
        payload = _encode_for_split(vals, meta)
        return payload, meta  # planes are already zstd'd individually
    elif codec == "delta_bitpack":
        payload = _encode_delta(vals, meta)
    elif codec == "rle_bitpack":
        payload = _encode_rle(vals, meta)
    else:
        raise ValueError(f"unknown int codec {codec}")
    if post_zstd:
        payload = maybe_post_compress(payload, meta)
    return payload, meta


def decode_ints(payload: bytes, meta: dict) -> np.ndarray:
    codec, n = meta["codec"], meta["n"]
    out_dtype = np.dtype(meta["dtype"])
    if codec == "constant":
        return np.full(n, meta["value"], dtype=out_dtype)
    payload = maybe_post_decompress(payload, meta)
    if codec == "plain":
        vals = np.frombuffer(payload, dtype=np.dtype(meta["plain_dtype"]))
    elif codec == "for_bitpack":
        vals = _decode_for(payload, meta)
    elif codec == "for_bytes":
        vals = _decode_for_bytes(payload, meta)
    elif codec == "for_split":
        vals = _decode_for_split(payload, meta)
    elif codec == "delta_bitpack":
        vals = _decode_delta(payload, meta)
    elif codec == "rle_bitpack":
        vals = _decode_rle(payload, meta)
    else:
        raise ValueError(f"unknown int codec {codec}")
    return vals.astype(out_dtype, copy=False)


# --- frame of reference + bitpack ---

def _for_width(vals: np.ndarray) -> tuple[int, int, int]:
    lo = int(vals.min())
    hi = int(vals.max())
    return lo, hi, bit_width(hi - lo)


def _encode_for(vals: np.ndarray, meta: dict) -> bytes:
    v = _as_i64(vals)
    lo, hi, w = _for_width(v)
    if w > 63:  # range doesn't fit; degrade to plain
        meta["codec"] = "plain"
        meta["plain_dtype"] = "<i8"
        return v.tobytes()
    meta["ref"] = lo
    meta["width"] = w
    return pack_bits((v - lo).view(np.uint64), w)


def _decode_for(payload: bytes, meta: dict) -> np.ndarray:
    u = unpack_bits(payload, meta["n"], meta["width"])
    with np.errstate(over="ignore"):  # mod-2^64 add for wrapped refs
        return (u.view(np.int64) + np.int64(meta["ref"]))


# --- frame of reference + byte-aligned cast (+ zstd post-compression) ---
#
# The speed path: instead of packing to exact bit width, subtract the frame
# reference and cast to the smallest byte-aligned unsigned dtype (u8/u16/u32/
# u64). Byte-aligned layouts are far cheaper to produce (one vectorized cast,
# ~5x less memory traffic than bit-plane packing) and leave zstd a byte-
# structured stream it compresses as well as — often better than — misaligned
# packed bits. The sampling selector arbitrates by measured size.

def _encode_for_bytes(vals: np.ndarray, meta: dict) -> bytes:
    r, lo, w = _for_reduce(vals)
    if r is None:
        meta["codec"] = "plain"
        meta["plain_dtype"] = "<i8"
        return _as_i64(vals).tobytes()
    meta["ref"] = lo
    for dt in ("<u1", "<u2", "<u4", "<u8"):
        if w <= np.dtype(dt).itemsize * 8:
            meta["cast"] = dt
            return r.astype(np.dtype(dt), copy=False).tobytes()
    raise AssertionError("unreachable")


def _decode_for_bytes(payload: bytes, meta: dict) -> np.ndarray:
    u = np.frombuffer(payload, dtype=np.dtype(meta["cast"]))
    with np.errstate(over="ignore"):  # mod-2^64 add for wrapped refs
        return u.astype(np.int64) + np.int64(meta["ref"])


# --- frame of reference + byte-PLANE split + per-plane zstd ---
#
# Like for_bytes, but the cast buffer is decomposed into its byte planes
# (all low bytes, then all high bytes, ...), each zstd'd separately. On
# zipf-like data the high plane is near-constant and the low plane is
# byte-structured, so zstd models each stream better than the interleaved
# buffer: measured 2-4% smaller AND slightly faster than for_bytes+zstd on
# the tokens corpus. Decode is one deinterleave copy.

def _encode_for_split(vals: np.ndarray, meta: dict) -> bytes:
    from .zstd import zstd_compress

    r, lo, w = _for_reduce(vals)
    if r is None:
        meta["codec"] = "plain"
        meta["plain_dtype"] = "<i8"
        return _as_i64(vals).tobytes()
    meta["ref"] = lo
    for dt in ("<u1", "<u2", "<u4", "<u8"):
        if w <= np.dtype(dt).itemsize * 8:
            meta["cast"] = dt
            k = np.dtype(dt).itemsize
            u = r.astype(np.dtype(dt), copy=False)
            planes = u.view(np.uint8).reshape(-1, k)
            parts = []
            lens = []
            raw_lens = []
            flags = []
            for i in range(k):
                # .tobytes() on the strided column does the gather in ONE
                # copy (ascontiguousarray first would do two)
                raw = planes[:, i].tobytes()
                z = zstd_compress(raw)
                if len(z) >= len(raw):
                    z, compressed = raw, False
                else:
                    compressed = True
                parts.append(z)
                lens.append(len(z))
                raw_lens.append(len(raw))
                flags.append(compressed)
            meta["plane_lens"] = lens
            meta["plane_raw_lens"] = raw_lens
            meta["plane_zstd"] = flags
            return b"".join(parts)
    raise AssertionError("unreachable")


def _decode_for_split(payload: bytes, meta: dict) -> np.ndarray:
    from .zstd import zstd_decompress

    dt = np.dtype(meta["cast"])
    k = dt.itemsize
    n = meta["n"]
    out = np.empty((n, k), dtype=np.uint8)
    pos = 0
    for i, (ln, raw_len, z) in enumerate(zip(meta["plane_lens"],
                                             meta["plane_raw_lens"],
                                             meta["plane_zstd"])):
        chunk = payload[pos:pos + ln]
        pos += ln
        raw = zstd_decompress(chunk, raw_len) if z else chunk
        out[:, i] = np.frombuffer(raw, dtype=np.uint8)
    u = out.reshape(-1).view(dt)
    with np.errstate(over="ignore"):  # mod-2^64 add for wrapped refs
        return u.astype(np.int64) + np.int64(meta["ref"])


# --- delta + zigzag + bitpack (sorted / smooth sequences, e.g. offsets) ---

def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).view(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    zi = z.view(np.int64)
    return (z >> np.uint64(1)).view(np.int64) ^ -(zi & 1)


def _encode_delta(vals: np.ndarray, meta: dict) -> bytes:
    v = _as_i64(vals)
    meta["first"] = int(v[0])
    d = np.diff(v)
    if d.size == 0:
        meta["width"] = 0
        return b""
    z = _zigzag(d)
    w = bit_width(int(z.max()))
    if w > 63:
        meta["codec"] = "plain"
        meta["plain_dtype"] = "<i8"
        meta.pop("first", None)
        return v.tobytes()
    meta["width"] = w
    return pack_bits(z, w)


def _decode_delta(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    out = np.empty(n, dtype=np.int64)
    out[0] = meta["first"]
    if n > 1:
        z = unpack_bits(payload, n - 1, meta["width"])
        out[1:] = _unzigzag(z)
        np.cumsum(out, out=out)
    return out


# --- run-length encode (run values + run lengths, each FOR+bitpacked) ---

def _encode_rle(vals: np.ndarray, meta: dict) -> bytes:
    v = _as_i64(vals)
    boundaries = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    run_vals = v[starts]
    run_lens = np.diff(np.concatenate((starts, [v.size])))
    pv, mv = encode_ints(run_vals, "for_bitpack", post_zstd=False)
    pl, ml = encode_ints(run_lens, "for_bitpack", post_zstd=False)
    meta["vals_meta"] = mv
    meta["lens_meta"] = ml
    meta["parts"] = [len(pv), len(pl)]
    return pv + pl


def _decode_rle(payload: bytes, meta: dict) -> np.ndarray:
    n1, _ = meta["parts"]
    run_vals = decode_ints(payload[:n1], meta["vals_meta"])
    run_lens = decode_ints(payload[n1:], meta["lens_meta"])
    return np.repeat(run_vals, run_lens)


def is_constant(vals: np.ndarray) -> bool:
    return vals.size == 0 or bool(np.all(vals == vals.flat[0]))
