"""Codec registry: lightweight per-column compression kernels.

Int codecs  : plain | constant | for_bitpack | delta_bitpack | rle_bitpack
Str codecs  : plain_str | dict_str | fsst
Float codecs: plain_float | bss_float (byte-stream-split)
All payloads may carry zstd post-compression (``meta["post"]``).
"""

from .bitpack import bit_width, pack_bits, unpack_bits
from .intcodecs import INT_CODECS, decode_ints, encode_ints, is_constant
from .strcodecs import STR_CODECS, decode_strings, encode_strings
from .floatcodecs import FLOAT_CODECS, decode_floats, encode_floats
from .fsst import FsstNotApplicable, fsst_decode, fsst_encode
from .zstd import zstd_compress, zstd_decompress

__all__ = [
    "bit_width", "pack_bits", "unpack_bits",
    "INT_CODECS", "encode_ints", "decode_ints", "is_constant",
    "STR_CODECS", "encode_strings", "decode_strings",
    "FLOAT_CODECS", "encode_floats", "decode_floats",
    "FsstNotApplicable", "fsst_encode", "fsst_decode",
    "zstd_compress", "zstd_decompress",
]
