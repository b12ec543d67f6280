"""Lightweight per-column compression codecs (pure numpy, vectorized).

Five codec families per the north rule: dictionary, RLE, FSST, bit-packing,
frame-of-reference (with the FOR->bitpack cascade), plus plain fallbacks.
Every codec guarantees exact round-trip: ``decode(encode(x)) == x``
bit-identically (token-array equality invariant, BASELINE.json input_hint).

Integer codecs operate on 1-D numpy integer arrays, string codecs on pyarrow
string buffers (offsets + utf8 bytes), float codecs on raw IEEE754 words.
There is no per-row Python anywhere in the encode/decode hot path.
"""

from aisle_spark.codecs.ints import (
    INT_CODECS,
    bitpack_decode,
    bitpack_encode,
    decode_ints,
    encode_ints,
    estimate_int_sizes,
)
from aisle_spark.codecs.strings import (
    STR_CODECS,
    decode_strings,
    encode_strings,
)
from aisle_spark.codecs.floats import decode_floats, encode_floats

__all__ = [
    "INT_CODECS",
    "STR_CODECS",
    "bitpack_encode",
    "bitpack_decode",
    "encode_ints",
    "decode_ints",
    "estimate_int_sizes",
    "encode_strings",
    "decode_strings",
    "encode_floats",
    "decode_floats",
]
