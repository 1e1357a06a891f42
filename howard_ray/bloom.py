"""Per-block Bloom filters — point-lookup pruning for NON-clustered keys.

Zone maps (footer min/max) prune range predicates on the cluster key, but a
point lookup on an unordered high-cardinality column (``doc_id IN (...)``
on a source-clustered store) admits every block: its min/max spans the
domain. A per-block Bloom sidecar answers "is this value POSSIBLY in this
block" from a few KB of bits, so the decode task skips the block without
decoding even the predicate column — at 10^12-row scale that converts a
full-store single-column decode into O(matching blocks) work plus one tiny
sidecar read per candidate block. (Parquet's column-index Bloom filters and
the reference's tabix point lookups are the same idea,
howard/objects/variants.py:2351-2444.)

Standard partitioned Bloom construction: m = next-pow2(bits_per_key x
n_keys) bits, k = ~0.69 x bits_per_key probes, double hashing
``idx_i = (h1 + i*h2) mod m`` over a deterministic SipHash-1-3 base hash
(pandas hash_array with a fixed key — stable across processes, so a filter
built by one worker is probed correctly by any other).

File format (``blooms/<block_id>.c_<col>.blm``):
    b"HRBL" | u32 k | u64 m_bits | bitset bytes | u32 crc32(bitset)
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

MAGIC = b"HRBL"


def bloom_path(store_dir: str, fname: str) -> str:
    return os.path.join(store_dir, "blooms", fname)


def bloom_file_name(block_id: str, column: str) -> str:
    return f"{block_id}.c_{column}.blm"


def hash_values(col) -> np.ndarray:
    """Deterministic u64 hash of a string or integer Arrow column (or a
    Python list of probe values). One code path for build AND probe —
    the only correctness requirement of a Bloom filter."""
    if isinstance(col, (list, tuple)):
        col = pa.array(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        # token-presence index: the filter is built over the block's
        # DISTINCT list VALUES (e.g. distinct token ids), probed by the
        # decode path's 'contains' predicate with scalar token ids
        col = col.flatten().unique()
    if col.null_count:
        # drop nulls BEFORE numeric conversion: to_numpy on a nullable
        # int column round-trips through float64, so values above 2^53
        # would hash differently at build than at probe — a FALSE
        # NEGATIVE that wrongly prunes a block containing the value
        # (nulls themselves never match an ==/IN probe, so dropping
        # them from the filter is exact)
        import pyarrow.compute as pc
        col = pc.drop_null(col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.util.hash_array(vals.astype(np.int64), categorize=False)
    obj = np.asarray(col.to_pylist(), dtype=object)
    return pd.util.hash_array(obj, categorize=False)


def _params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    m_bits = 1 << max(6, int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    k = max(1, int(round(0.69 * bits_per_key)))
    return m_bits, k


def build_filter(col, bits_per_key: int = 10) -> bytes:
    """Serialize a Bloom filter over the column's values."""
    h = hash_values(col)
    m_bits, k = _params(len(h), bits_per_key)
    h1 = h
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd => full-period stride
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    mask = np.uint64(m_bits - 1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (idx & np.uint64(7)).astype(np.uint8)))
    body = bits.tobytes()
    return (MAGIC + int(k).to_bytes(4, "little")
            + int(m_bits).to_bytes(8, "little") + body
            + zlib.crc32(body).to_bytes(4, "little"))


def maybe_contains(data: bytes, values) -> bool:
    """True iff ANY of ``values`` is possibly present (False is definite)."""
    if data[:4] != MAGIC:
        raise ValueError("bad bloom magic")
    k = int.from_bytes(data[4:8], "little")
    m_bits = int.from_bytes(data[8:16], "little")
    body = data[16:16 + (m_bits >> 3)]
    if zlib.crc32(body) != int.from_bytes(data[16 + (m_bits >> 3):
                                               20 + (m_bits >> 3)], "little"):
        raise IOError("bloom bitset crc mismatch")
    bits = np.frombuffer(body, dtype=np.uint8)
    h = hash_values(values)
    h1, h2 = h, (h >> np.uint64(32)) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    alive = np.ones(len(h), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        alive &= (byte & np.left_shift(
            np.uint8(1), (idx & np.uint64(7)).astype(np.uint8))) != 0
        if not alive.any():
            return False
    return True


def probe_file(path: str, values) -> bool:
    from . import storeio as sio
    with sio.sopen(path, "rb") as f:
        return maybe_contains(f.read(), values)
