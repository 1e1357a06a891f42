"""String-array codecs: plain (offsets+bytes), dictionary (hash symbol
table -> bit-packed indices), and FSST-style (see fsst.py).

Dictionary encoding targets low-cardinality string columns (``source``),
mirroring what the reference gets implicitly from Parquet dictionary pages
when it builds its annotation stores (howard/functions/databases.py:2199-2213);
here it is an explicit codec with the symbol table in the block meta.
All operate on ``pyarrow`` string arrays for zero-copy access to the
offsets/data buffers — no per-row Python loop on the plain/dict paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .intcodecs import decode_ints, encode_ints
from .fsst import fsst_decode, fsst_encode, fsst_encode_buffers, fsst_expand
from .zstd import maybe_post_compress, maybe_post_decompress

STR_CODECS = ("plain_str", "dict_str", "fsst")


def _to_arrow_str(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    return arr


def _str_buffers(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(offsets int64 ndarray, data bytes) of a non-null pa.string array."""
    if arr.null_count:
        raise ValueError("null strings not supported (engine schema is non-null)")
    arr = _to_arrow_str(arr)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                        count=len(arr) + 1 + arr.offset)[arr.offset:]
    lo, hi = int(off[0]), int(off[-1])
    data = arr.buffers()[2].to_pybytes()[lo:hi] if arr.buffers()[2] is not None else b""
    return off.astype(np.int64) - lo, data


def encode_strings(arr, codec: str, post_zstd: bool = True) -> tuple[bytes, dict]:
    arr = _to_arrow_str(arr)
    if codec == "fsst":
        off, data = _str_buffers(arr)  # validates non-null
        return fsst_encode_buffers(off, data, post_zstd=post_zstd)
    meta: dict = {"codec": codec, "n": len(arr)}
    if codec == "plain_str":
        off, data = _str_buffers(arr)
        p_off, m_off = encode_ints(off, "delta_bitpack", post_zstd=False)
        meta["off_meta"] = m_off
        meta["parts"] = [len(p_off), len(data)]
        payload = p_off + data
        if post_zstd:
            payload = maybe_post_compress(payload, meta)
        return payload, meta
    if codec == "dict_str":
        d = pc.dictionary_encode(arr)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        idx = np.asarray(d.indices, dtype=np.int64)
        p_idx, m_idx = encode_ints(idx, "for_bitpack", post_zstd=False)
        p_dict, m_dict = encode_strings(d.dictionary, "plain_str", post_zstd=False)
        meta["idx_meta"] = m_idx
        meta["dict_meta"] = m_dict
        meta["parts"] = [len(p_idx), len(p_dict)]
        payload = p_idx + p_dict
        if post_zstd:
            payload = maybe_post_compress(payload, meta)
        return payload, meta
    raise ValueError(f"unknown string codec {codec}")


def decode_strings(payload: bytes, meta: dict) -> pa.Array:
    codec = meta["codec"]
    if codec == "fsst":
        n = meta["n"]
        if n == 0:
            return pa.array([], type=pa.string())
        data = fsst_expand(payload, meta)
        # buffer-level split: sep is a free byte (never in content), so
        # its positions ARE the row boundaries — offsets by subtraction,
        # values by one boolean gather; no per-row Python bytes/str
        u8 = np.frombuffer(data, dtype=np.uint8)
        keep = u8 != np.uint8(meta["sep"])
        n_sep = int(len(u8) - keep.sum())
        if n_sep != n - 1:  # defensive: corrupt stream
            items = fsst_decode(payload, meta)
            return pa.array([b.decode("utf-8") for b in items],
                            type=pa.string())
        sep_pos = np.flatnonzero(~keep)
        offs = np.empty(n + 1, dtype=np.int32)
        offs[0] = 0
        offs[1:-1] = (sep_pos - np.arange(n_sep)).astype(np.int32)
        offs[-1] = np.int32(len(u8) - n_sep)
        return pa.StringArray.from_buffers(
            n, pa.py_buffer(offs.tobytes()),
            pa.py_buffer(u8[keep].tobytes()))
    payload = maybe_post_decompress(payload, meta)
    if codec == "plain_str":
        n1, _ = meta["parts"]
        off = decode_ints(payload[:n1], meta["off_meta"]).astype(np.int32)
        data = payload[n1:]
        return pa.StringArray.from_buffers(
            meta["n"], pa.py_buffer(off.tobytes()), pa.py_buffer(data))
    if codec == "dict_str":
        n1, _ = meta["parts"]
        idx = decode_ints(payload[:n1], meta["idx_meta"])
        dictionary = decode_strings(payload[n1:], meta["dict_meta"])
        return pc.take(dictionary, pa.array(idx, type=pa.int64()))
    raise ValueError(f"unknown string codec {codec}")
