"""Bit-packing primitives (pure NumPy, vectorized — no per-value Python loop).

Values are packed little-endian, ``width`` bits per value. ``width == 0``
encodes a constant-zero array in zero bytes.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_val: int) -> int:
    """Number of bits needed to represent ``max_val`` (>= 0)."""
    if max_val < 0:
        raise ValueError("bit_width requires non-negative input")
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width`` bits each (little-endian)."""
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    # (n, width) bit matrix -> packbits; vectorized, ~n*width bytes temp.
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits, bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
