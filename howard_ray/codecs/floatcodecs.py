"""Float-array codecs: plain / byte-stream-split, with opportunistic zstd
post-compression.

``bss_float`` is the BYTE_STREAM_SPLIT encoding (Parquet format spec
Encodings.md): the k-th byte of every IEEE-754 value is gathered into its own
contiguous plane, so the near-constant sign/exponent bytes of same-magnitude
floats (embeddings, scores) compress far better under zstd than interleaved
raw bytes. Lossless by construction — pure uint8 view + transpose, so NaN
payloads and signed zeros round-trip bit-identical.

Extends the engine's token/int/string codec set to the ``embeddings`` table
(``embedding: list<float>``), the other first-class training-data payload.
The reference stores such columns as Parquet FLOAT with zstd (its annotation
store build, howard/functions/databases.py:1406,2213); we mirror that with a
lighter-weight dedicated plane codec.
"""

from __future__ import annotations

import numpy as np

from .zstd import maybe_post_compress, maybe_post_decompress

FLOAT_CODECS = ("plain_float", "bss_float")


def encode_floats(vals: np.ndarray, codec: str, post_zstd: bool = True) -> tuple[bytes, dict]:
    """Encode a float ndarray with the named codec → (payload, meta)."""
    vals = np.ascontiguousarray(vals)
    if vals.dtype.kind != "f":
        raise TypeError(f"float codec on dtype {vals.dtype}")
    meta: dict = {"codec": codec, "n": int(vals.size), "dtype": vals.dtype.str}
    if vals.size == 0:
        return b"", meta
    if codec == "plain_float":
        payload = vals.tobytes()
    elif codec == "bss_float":
        w = vals.dtype.itemsize
        # (n, w) byte matrix → transpose → w contiguous planes
        planes = vals.view(np.uint8).reshape(-1, w).T
        payload = np.ascontiguousarray(planes).tobytes()
    else:
        raise ValueError(f"unknown float codec {codec}")
    if post_zstd:
        payload = maybe_post_compress(payload, meta)
    return payload, meta


def decode_floats(payload: bytes, meta: dict) -> np.ndarray:
    codec, n = meta["codec"], meta["n"]
    dtype = np.dtype(meta["dtype"])
    if n == 0:
        return np.empty(0, dtype=dtype)
    payload = maybe_post_decompress(payload, meta)
    if codec == "plain_float":
        return np.frombuffer(payload, dtype=dtype)
    if codec == "bss_float":
        w = dtype.itemsize
        planes = np.frombuffer(payload, dtype=np.uint8).reshape(w, n)
        return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)
    raise ValueError(f"unknown float codec {codec}")
