"""Per-block bloom filters for high-cardinality point lookups.

The analog of aisle's Sbbf bloom pruning (/root/reference/src/prune/
bloom.rs:9-54): definite-absence only — a set bit pattern missing proves no
row in the block equals the value (prune); presence proves nothing (keep).
Built for string columns whose block cardinality exceeds the dictionary-
hint threshold (blooms and dict hints are complementary evidence, like the
reference's hint-injection rewrite /root/reference/src/expr/rewrite.rs).

Fixed geometry per filter so manifest-side membership tests vectorize:
M_BYTES * 8 bits, K probes via double hashing. At 4096 keys/block and
32768 bits, ~8 bits/key with K=6 gives ~2% false-positive keeps — a kept
block costs one wasted decode, never a wrong result.

Storage is an ``array<int64>`` of M_WORDS little-endian words (bit p lives
in word ``p >> 6`` at bit ``p & 63``) rather than binary, so the manifest-
side membership test is pure Catalyst — ``shiftright(element_at(bloom, w),
b) & 1`` on driver-computed positions — and stays inside whole-stage
codegen. A Python-UDF bloom test in the manifest filter was measured to
drag every payload column through an ArrowEvalPython exchange, making the
pruned scan SLOWER than a full decode (BENCH_r01, VERDICT r1 item 1).

Hashing: FNV-1a over the first HASH_PREFIX bytes plus the length, two
seeds, all vectorized over the concatenated byte buffer (no per-row
Python on the build side).
"""

from __future__ import annotations

import numpy as np

M_BYTES = 4096
M_BITS = M_BYTES * 8
M_WORDS = M_BYTES // 8
K = 6
HASH_PREFIX = 64

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_SEED2 = np.uint64(0x9E3779B97F4A7C15)


def _fnv_pair_vec(lengths: np.ndarray, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two FNV-1a hashes per string, vectorized by byte position."""
    n = int(lengths.size)
    lengths = lengths.astype(np.int64, copy=False)
    starts = np.cumsum(lengths) - lengths
    h1 = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    h2 = h1 ^ _SEED2
    upto = int(min(HASH_PREFIX, lengths.max() if n else 0))
    for j in range(upto):
        m = lengths > j
        if not m.any():
            break
        b = data[starts[m] + j].astype(np.uint64)
        h1[m] = (h1[m] ^ b) * _FNV_PRIME
        h2[m] = (h2[m] ^ (b + np.uint64(1))) * _FNV_PRIME
    # mix in the full length so long shared-prefix strings still separate
    lu = lengths.view(np.uint64) if lengths.dtype == np.int64 else lengths.astype(np.uint64)
    h1 = (h1 ^ lu) * _FNV_PRIME
    h2 = (h2 ^ (lu + np.uint64(7))) * _FNV_PRIME
    return h1, h2


def build_bloom(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Bloom filter over a chunk of strings (Arrow parts layout), returned
    as M_WORDS int64 words (the manifest storage form)."""
    bloom = np.zeros(M_BYTES, dtype=np.uint8)
    if lengths.size:
        h1, h2 = _fnv_pair_vec(lengths, data)
        for i in range(K):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(M_BITS)
            np.bitwise_or.at(bloom, (pos >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bloom.view(np.uint64).view(np.int64)


def bloom_positions(value: bytes) -> np.ndarray:
    """Bit positions a single literal would set (query side)."""
    data = np.frombuffer(value, dtype=np.uint8)
    h1, h2 = _fnv_pair_vec(np.array([len(value)], dtype=np.int64), data)
    i = np.arange(K, dtype=np.uint64)
    return ((h1[0] + i * h2[0]) % np.uint64(M_BITS)).astype(np.int64)


def bloom_may_contain(bloom: np.ndarray, value: bytes) -> bool:
    words = np.asarray(bloom, dtype=np.int64).view(np.uint64)
    pos = bloom_positions(value)
    return bool(
        ((words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)).all()
    )


def blooms_absent_matrix(blooms: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized definite-absence over a stacked (n_blocks, M_WORDS)
    word matrix for one literal's positions: True => provably absent."""
    words = blooms.view(np.uint64) if blooms.dtype != np.uint64 else blooms
    present = np.ones(words.shape[0], dtype=bool)
    for p in pos:
        present &= (
            (words[:, p >> 6] >> np.uint64(p & 63)) & np.uint64(1)
        ).astype(bool)
    return ~present
