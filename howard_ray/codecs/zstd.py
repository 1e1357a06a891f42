"""zstd post-compression wrapper (honest fallback codec).

Any lightweight-codec payload may additionally be zstd-compressed when the
sampling selector finds it helps; and ``zstd`` on the raw buffer is itself a
codec choice, which guarantees the engine can never do worse than
"store zstd-compressed raw" on a pathological block (SURVEY.md §7.4:
"Size guarantee ≤ Parquet+zstd requires honest fallback").
"""

from __future__ import annotations

import pyarrow as pa

# worker-local compression effort; 1 = throughput profile, higher = archive
# profile (set per task/actor from the pipeline's `profile` option)
LEVEL = 1
_codecs: dict[int, pa.Codec] = {}


def set_level(level: int) -> None:
    global LEVEL
    LEVEL = level


def _codec() -> pa.Codec:
    c = _codecs.get(LEVEL)
    if c is None:
        c = _codecs[LEVEL] = pa.Codec("zstd", compression_level=LEVEL)
    return c


def zstd_compress(buf: bytes) -> bytes:
    return _codec().compress(buf, asbytes=True)


def zstd_decompress(buf: bytes, decompressed_size: int) -> bytes:
    if decompressed_size == 0:
        return b""
    return pa.decompress(buf, decompressed_size=decompressed_size, codec="zstd", asbytes=True)


def maybe_post_compress(payload: bytes, meta: dict, min_gain: float = 0.9) -> bytes:
    """zstd-compress ``payload`` if it shrinks below ``min_gain`` of original.

    Mutates ``meta`` (adds ``post`` + ``raw_len``) when compression is applied.
    """
    if len(payload) < 64:
        return payload
    z = zstd_compress(payload)
    if len(z) < len(payload) * min_gain:
        meta["post"] = "zstd"
        meta["raw_len"] = len(payload)
        return z
    return payload


def maybe_post_decompress(payload: bytes, meta: dict) -> bytes:
    if meta.get("post") == "zstd":
        return zstd_decompress(payload, meta["raw_len"])
    return payload
