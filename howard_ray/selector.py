"""Sampling-based codec auto-selector.

Per block and per column: take a ~1% Arrow-slice sample (min 1024 values),
actually encode the sample with every candidate codec, and pick the one with
the fewest estimated bits/value. This is the reference's "sample to decide,
then full pass" idiom (CSV schema sniffing sample_size=20480,
howard/objects/database.py:1268,1361; dbNSFP structure sample
howard/functions/databases.py:2090) applied to compression, and its
rule-engine shape — per-block rule evaluation producing a choice + provenance
(prioritization criteria engine, howard/objects/variants.py:7073-7815).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import (
    FsstNotApplicable,
    encode_floats,
    encode_ints,
    encode_strings,
    is_constant,
)

SAMPLE_FRACTION = 0.01
MIN_SAMPLE = 1024

INT_CANDIDATES = ("for_bytes", "for_split", "for_bitpack", "delta_bitpack",
                  "rle_bitpack", "plain")
FAST_CANDIDATES = ("for_bytes", "for_split")
# prefer the byte-aligned cast codec (5-10x cheaper encode/decode) unless a
# bit-exact codec is >10% smaller on the sample
SPEED_BIAS = 1.10
STR_CANDIDATES = ("dict_str", "fsst", "plain_str")
FLOAT_CANDIDATES = ("bss_float", "plain_float")


def _sample_ints(vals: np.ndarray) -> np.ndarray:
    n = vals.size
    k = max(MIN_SAMPLE, int(n * SAMPLE_FRACTION))
    if n <= k:
        return vals
    # contiguous slice sample (north_star: "1% Arrow-slice sample per block");
    # a middle slice avoids header/tail artifacts without a shuffle.
    start = (n - k) // 2
    return vals[start:start + k]


def choose_int_codec(vals: np.ndarray) -> str:
    """Pick the int codec with minimal sampled encoded size."""
    if is_constant(vals):
        return "constant"
    sample = _sample_ints(np.asarray(vals))
    sizes: dict[str, int] = {}
    for codec in INT_CANDIDATES:
        payload, _ = encode_ints(sample, codec)
        sizes[codec] = len(payload)
    best = min(sizes, key=sizes.get)
    fast_best = min(FAST_CANDIDATES, key=lambda c: sizes[c])
    if sizes[fast_best] <= sizes[best] * SPEED_BIAS:
        return fast_best
    return best


def choose_float_codec(vals: np.ndarray) -> str:
    """Pick the float codec with minimal sampled encoded size."""
    sample = _sample_ints(np.asarray(vals))
    sizes = {codec: len(encode_floats(sample, codec)[0])
             for codec in FLOAT_CANDIDATES}
    return min(sizes, key=sizes.get)


def choose_str_codec(arr: pa.Array) -> str:
    """Pick the string codec with minimal sampled encoded size."""
    n = len(arr)
    if n == 0:
        return "plain_str"
    k = max(MIN_SAMPLE, int(n * SAMPLE_FRACTION))
    sample = arr if n <= k else arr.slice((n - k) // 2, k)
    best, best_len = "plain_str", None
    for codec in STR_CANDIDATES:
        try:
            payload, _ = encode_strings(sample, codec)
        except FsstNotApplicable:
            continue
        if best_len is None or len(payload) < best_len:
            best, best_len = codec, len(payload)
    return best
