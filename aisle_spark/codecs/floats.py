"""Float codecs: plain IEEE754, dictionary (low-cardinality reals).

Floats are routed through the integer machinery by reinterpreting the raw
bit pattern (float64 -> int64, float32 -> int32), which preserves NaN
payloads and signed zeros bit-identically. Dictionary / RLE selection then
works unchanged on the bit-pattern domain (ordering is irrelevant — order
is only used by FOR, whose exactness holds for any bijection).

Payload layout:  u8 kind(0=f32,1=f64) | int-codec payload of bit patterns
"""

from __future__ import annotations

import struct

import numpy as np

from aisle_spark.codecs.ints import decode_ints, encode_ints


def encode_floats(arr: np.ndarray, codec: str | None = None) -> bytes:
    if arr.dtype == np.float32:
        kind, bits = 0, arr.view(np.int32)
    elif arr.dtype == np.float64:
        kind, bits = 1, arr.view(np.int64)
    else:
        raise TypeError(f"unsupported float dtype {arr.dtype}")
    return struct.pack("<B", kind) + encode_ints(bits, codec)


def decode_floats(buf: bytes | memoryview) -> np.ndarray:
    buf = memoryview(buf)
    (kind,) = struct.unpack_from("<B", buf, 0)
    bits = decode_ints(buf[1:])
    return bits.view(np.float32 if kind == 0 else np.float64)
