"""FSST-style string symbol-table codec (from scratch, public knowledge).

Modeled on the published FSST idea (Boncz, Neumann & Leis, "FSST: Fast Random
Access String Compression", VLDB 2018): build a small table of frequent
substrings ("symbols", 2..8 bytes) from a sample, then encode strings by
replacing symbol occurrences with 1-byte codes. This implementation keeps the
symbol-table idea but chooses a vectorization-friendly variant suited to a
pure-Python/NumPy runtime:

- code bytes are chosen from byte values that do NOT occur anywhere in the
  block's string data (so no escape byte is needed and ``bytes.replace`` — a
  C-speed kernel — is an exact, invertible encoder);
- strings are joined with a separator byte also chosen from the unused set,
  so the whole column is encoded with a handful of buffer-level
  ``bytes.replace`` calls instead of a per-string Python loop;
- decode applies the replaces in exact reverse order then splits on the
  separator. Since every code byte is unique, absent from the original data,
  and absent from every symbol, sequential replacement is exactly invertible.

If the block's data uses too many distinct byte values to leave enough free
codes, the encoder raises and the selector falls back to dict/plain+zstd
(the honest-fallback rule, SURVEY.md §7.4). The symbol table is stored in
the block meta, so decoding never depends on which actor encoded the block
(north_star: "symbol tables serialized into block meta").
"""

from __future__ import annotations

import base64

import numpy as np

from .zstd import maybe_post_compress, maybe_post_decompress

MAX_SYMBOL_LEN = 8
MIN_SYMBOL_LEN = 2
MAX_SYMBOLS = 200
SAMPLE_BYTES = 1 << 13
SYMBOL_LENGTHS = (2, 3, 4, 6, 8)  # skip 5/7: near-duplicate gains, 30% less sampling cost


class FsstNotApplicable(ValueError):
    """Raised when the block's byte alphabet leaves too few free code bytes."""


def _free_bytes(data: bytes) -> np.ndarray:
    """Byte values (0..255) not present in ``data``."""
    present = np.zeros(256, dtype=bool)
    if data:
        arr = np.frombuffer(data, dtype=np.uint8)
        present[np.unique(arr)] = True
    return np.flatnonzero(~present)


def _candidate_symbols(sample: bytes, sep: int) -> list[bytes]:
    """Frequent 2..8-byte substrings of ``sample``, ranked by estimated gain.

    Counting is vectorized: sliding byte n-gram views -> np.unique with
    counts (the reference's sample-to-decide idiom,
    howard/objects/database.py:1361, applied to substrings).
    """
    arr = np.frombuffer(sample, dtype=np.uint8)
    scored: list[tuple[int, bytes]] = []
    for ln in SYMBOL_LENGTHS:
        if arr.size < ln:
            break
        win = np.lib.stride_tricks.sliding_window_view(arr, ln)
        grams, counts = np.unique(win, axis=0, return_counts=True)
        keep = counts >= 4
        grams, counts = grams[keep], counts[keep]
        order = np.argsort(counts)[::-1][:256]
        for g, c in zip(grams[order], counts[order]):
            b = g.tobytes()
            if bytes([sep]) in b:
                continue
            gain = int(c) * (ln - 1)
            scored.append((gain, b))
    scored.sort(key=lambda t: (-t[0], t[1]))
    out: list[bytes] = []
    seen: set[bytes] = set()
    for _, b in scored:
        if b in seen:
            continue
        seen.add(b)
        out.append(b)
        if len(out) >= MAX_SYMBOLS:
            break
    # longest-first so greedy replaces prefer longer matches
    out.sort(key=lambda b: (-len(b), b))
    return out


def fsst_encode(strings: "np.ndarray | list[bytes]", post_zstd: bool = True) -> tuple[bytes, dict]:
    """Encode a column of strings/bytes → (payload, meta).

    ``strings`` is a list/array of ``bytes`` (call ``.encode()`` upstream for
    str). Raises :class:`FsstNotApplicable` when <24 free code bytes exist.
    Thin wrapper over :func:`fsst_encode_buffers` (the vectorized
    offsets+values form the block layer uses)."""
    items = [s if isinstance(s, bytes) else s.encode("utf-8") for s in strings]
    off = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in items], out=off[1:])
    return fsst_encode_buffers(off, b"".join(items), post_zstd=post_zstd)


def fsst_encode_buffers(off: np.ndarray, data: bytes,
                        post_zstd: bool = True) -> tuple[bytes, dict]:
    """Buffer-level encode: ``off`` (n+1 offsets) + ``data`` (the
    concatenated values buffer, exactly Arrow's layout). The sep-joined
    stream is built with ONE numpy scatter (each data byte shifts right
    by its row index) — no per-row Python bytes objects."""
    n = len(off) - 1
    meta: dict = {"codec": "fsst", "n": n}
    free = _free_bytes(data)
    if free.size < 24:
        raise FsstNotApplicable(f"only {free.size} free code bytes")
    sep = int(free[0])
    code_pool = [int(b) for b in free[1:]]
    if n <= 1:
        joined = data
    else:
        u8 = np.frombuffer(data, dtype=np.uint8)
        lens = np.diff(np.asarray(off, dtype=np.int64))
        out = np.full(len(u8) + n - 1, sep, dtype=np.uint8)
        out_idx = (np.arange(len(u8), dtype=np.int64)
                   + np.repeat(np.arange(n, dtype=np.int64), lens))
        out[out_idx] = u8
        joined = out.tobytes()

    sample = joined[:SAMPLE_BYTES]
    symbols = _candidate_symbols(sample, sep)[: len(code_pool)]

    encoded = joined
    used: list[tuple[bytes, int]] = []
    for sym, code in zip(symbols, code_pool):
        replaced = encoded.replace(sym, bytes([code]))
        if len(replaced) < len(encoded):
            used.append((sym, code))
            encoded = replaced
    meta["sep"] = sep
    meta["symbols"] = [[base64.b64encode(s).decode("ascii"), c] for s, c in used]
    payload = encoded
    if post_zstd:
        payload = maybe_post_compress(payload, meta)
    return payload, meta


def fsst_expand(payload: bytes, meta: dict) -> bytes:
    """Symbol expansion only: the sep-joined plaintext stream (sep and
    code bytes are free bytes, so neither occurs in the content)."""
    payload = maybe_post_decompress(payload, meta)
    data = payload
    for s64, code in reversed(meta["symbols"]):
        data = data.replace(bytes([code]), base64.b64decode(s64))
    return data


def fsst_decode(payload: bytes, meta: dict) -> list[bytes]:
    n = meta["n"]
    if n == 0:
        return []
    return fsst_expand(payload, meta).split(bytes([meta["sep"]]))
