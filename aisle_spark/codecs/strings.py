"""String codecs: plain, dictionary, FSST-style static-symbol-table.

A string column chunk is represented as (lengths: int64[], utf8: uint8[]) —
the Arrow variable-length layout (offsets are the prefix sum of lengths).
All codecs are vectorized: numpy over the concatenated byte buffer plus
pyarrow compute for dictionary encoding. No per-row Python in any hot path
(the FSST trainer loops per *merge*, bounded, each pass a whole-buffer op).

FSST variant: a byte-pair-merge static symbol table. Repeatedly merging the
most frequent adjacent code pair yields symbols whose expansions are
concatenations of earlier symbols — the same symbol structure as FSST
(Boncz/Neumann/Leis, "FSST: Fast Random Access String Compression",
VLDB 2020). Final code space is one byte: up to 255 learned symbols plus an
escape code (0xFF) prefixing raw bytes. Decode is a gather through the
symbol table; per-string random access comes from the stored encoded byte
lengths (mirrors how the reference keeps page offsets for random access,
/root/reference/src/prune/page.rs:160-181 analog).

Payload layout (little-endian):  u8 codec_id | u32 n_strings | body
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from aisle_spark.codecs.ints import decode_ints, encode_ints

PLAIN_STR = 5
DICT_STR = 6
FSST = 7

STR_CODECS = {PLAIN_STR: "plain", DICT_STR: "dict", FSST: "fsst"}
STR_CODEC_IDS = {v: k for k, v in STR_CODECS.items()}

_HDR = struct.Struct("<BI")

_BOUNDARY = 256  # sentinel code marking string boundaries during training
_MAX_SYMBOLS = 255
_ESCAPE = 255


def arrow_from_parts(lengths: np.ndarray, data: np.ndarray) -> pa.Array:
    """Rebuild a pyarrow large_string array from (lengths, utf8 bytes)."""
    offsets = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64)))
    return pa.Array.from_buffers(
        pa.large_utf8(),
        int(lengths.size),
        [None, pa.py_buffer(offsets), pa.py_buffer(data.tobytes())],
    )


def parts_from_arrow(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Extract (lengths int64[], byte buffer uint8[]) from a pyarrow
    string OR binary array (same variable-length layout)."""
    big = (
        pa.large_binary()
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
        else pa.large_utf8()
    )
    arr = arr.cast(big)
    if arr.offset != 0:  # normalize sliced arrays
        arr = pa.concat_arrays([arr])
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
    start, end = int(buf_off[0]), int(buf_off[-1])
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=end - start, offset=start)
    lengths = np.diff(buf_off)
    return lengths, data


# ---------------------------------------------------------------------------
# FSST-style trainer / encoder / decoder
# ---------------------------------------------------------------------------


def _merge_pass(codes: np.ndarray, a: int, b: int, new_code: int) -> np.ndarray:
    """Replace non-overlapping (a,b) adjacencies with new_code. Vectorized;
    overlap only arises when a == b, resolved by keeping alternate matches."""
    match = (codes[:-1] == a) & (codes[1:] == b)
    pos = np.flatnonzero(match)
    if pos.size == 0:
        return codes
    if a == b:
        # keep greedy-from-left non-overlapping matches: within each run of
        # consecutive match positions keep even offsets
        new_run = np.concatenate(([True], np.diff(pos) > 1))
        run_start = pos[np.maximum.accumulate(np.where(new_run, np.arange(pos.size), 0))]
        pos = pos[(pos - run_start) % 2 == 0]
    mask = np.ones(codes.size, dtype=bool)
    mask[pos + 1] = False
    out = codes[mask]
    # each surviving match position shifts left by the deletions before
    # it — exactly its rank, since matches don't overlap
    out[pos - np.arange(pos.size)] = new_code
    return out


def _with_sentinels(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """int32 code array: raw bytes with a BOUNDARY sentinel after each string."""
    n = int(lengths.size)
    total = int(data.size)
    codes = np.full(total + n, _BOUNDARY, dtype=np.int32)
    if total:
        idx = np.arange(total) + np.repeat(np.arange(n), lengths)
        codes[idx] = data
    return codes


def _train_fsst(lengths: np.ndarray, data: np.ndarray, max_merges: int,
                min_count: int = 4) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Learn ordered merge rules on the (sampled) corpus. Also returns
    the sample's fully-merged code array: merges never cross the
    BOUNDARY sentinels, so when the sample is a string-aligned PREFIX of
    the corpus this array IS the replay result for that prefix and the
    encoder only replays the suffix."""
    codes = _with_sentinels(lengths, data)
    merges: list[tuple[int, int]] = []
    next_code = _BOUNDARY + 1
    for _ in range(max_merges):
        if codes.size < 2:
            break
        a, b = codes[:-1], codes[1:]
        valid = (a != _BOUNDARY) & (b != _BOUNDARY)
        if not valid.any():
            break
        # codes are 9-bit (256 raw + boundary + <=255 symbols), so a pair
        # is an 18-bit int32 key — sort + boundary-count replaces the
        # int64 np.unique (same winner: first-of-max == smallest key)
        pairs = ((a << 9) | b)[valid]
        pairs.sort()
        bnd = np.concatenate(([0], np.flatnonzero(pairs[1:] != pairs[:-1]) + 1))
        counts = np.diff(np.concatenate((bnd, [pairs.size])))
        top = int(counts.argmax())
        if counts[top] < min_count:
            break
        best = int(pairs[bnd[top]])
        pa_, pb_ = best >> 9, best & 0x1FF
        codes = _merge_pass(codes, pa_, pb_, next_code)
        merges.append((pa_, pb_))
        next_code += 1
    return merges, codes


def _expansions(merges: list[tuple[int, int]]) -> list[bytes]:
    exp: list[bytes] = []
    for a, b in merges:
        ea = bytes([a]) if a < 256 else exp[a - _BOUNDARY - 1]
        eb = bytes([b]) if b < 256 else exp[b - _BOUNDARY - 1]
        exp.append(ea + eb)
    return exp


def fsst_encode(lengths: np.ndarray, data: np.ndarray, sample_cap: int = 1 << 14,
                max_merges: int = _MAX_SYMBOLS) -> bytes:
    # 16 KB training sample: the symbol table converges on far less (the
    # FSST paper samples ~16 KB too); training was the encode-profile
    # hotspot at 64 KB with no measurable ratio gain
    n = int(lengths.size)
    lengths = lengths.astype(np.int64, copy=False)
    # clamp BEFORE training (greedy merges are prefix-stable, so this
    # equals the old train-then-truncate): the prefix-reuse below needs
    # trainer codes and replay to apply the SAME merge list
    max_merges = min(max_merges, _MAX_SYMBOLS)
    # --- train on a prefix sample ---
    if data.size > sample_cap:
        k = min(int(np.searchsorted(np.cumsum(lengths), sample_cap)) + 1, n)
        pre = int(lengths[:k].sum())
        merges, pre_codes = _train_fsst(lengths[:k], data[:pre], max_merges)
    else:
        k, pre = n, int(data.size)
        merges, pre_codes = _train_fsst(lengths, data, max_merges)
    exp = _expansions(merges)

    # --- encode full corpus: the trainer already holds the fully-merged
    # prefix (merges never cross BOUNDARY sentinels, and the sample is a
    # string-aligned prefix of the corpus), so only the SUFFIX replays ---
    if k < n:
        codes = _with_sentinels(lengths[k:], data[pre:])
        for i, (a, b) in enumerate(merges):
            codes = _merge_pass(codes, a, b, _BOUNDARY + 1 + i)
        codes = np.concatenate((pre_codes, codes))
    else:
        codes = pre_codes

    sent = codes == _BOUNDARY
    sent_pos = np.flatnonzero(sent)
    seg_lens = np.diff(np.concatenate(([-1], sent_pos))) - 1  # codes per string
    body = codes[~sent]
    is_sym = body > _BOUNDARY
    out_units = np.where(is_sym, 1, 2).astype(np.int64)  # escape+raw = 2
    out = np.empty(int(out_units.sum()), dtype=np.uint8)
    out_pos = np.cumsum(out_units) - out_units
    out[out_pos[is_sym]] = (body[is_sym] - _BOUNDARY - 1).astype(np.uint8)
    raw_pos = out_pos[~is_sym]
    out[raw_pos] = _ESCAPE
    out[raw_pos + 1] = body[~is_sym].astype(np.uint8)
    byte_lens = np.zeros(n, dtype=np.int64)
    if body.size:
        owner = np.repeat(np.arange(n), seg_lens)
        byte_lens = np.bincount(owner, weights=out_units, minlength=n).astype(np.int64)

    table_blob = b"".join(exp)
    table_lens = np.fromiter((len(e) for e in exp), dtype=np.int64, count=len(exp))
    tl_body = encode_ints(table_lens) if len(exp) else b""
    lens_body = encode_ints(byte_lens)
    return (
        struct.pack("<HIII", len(exp), len(table_blob), len(tl_body), len(lens_body))
        + table_blob
        + tl_body
        + lens_body
        + out.tobytes()
    )


def fsst_decode(buf: memoryview, n: int) -> tuple[np.ndarray, np.ndarray]:
    n_sym, blob_len, tl_len, ll = struct.unpack_from("<HIII", buf, 0)
    off = 14
    table_blob = np.frombuffer(buf[off : off + blob_len], dtype=np.uint8)
    off += blob_len
    table_lens = (
        decode_ints(buf[off : off + tl_len]) if tl_len else np.zeros(0, np.int64)
    )
    off += tl_len
    byte_lens = decode_ints(buf[off : off + ll]).astype(np.int64)
    off += ll
    stream = np.frombuffer(buf[off:], dtype=np.uint8)

    t_ends = np.cumsum(table_lens)
    t_starts = (t_ends - table_lens).astype(np.int64)

    # --- locate code starts (escape = 2-byte unit). Key fact: the first
    # byte of every maximal 0xFF-run is always a code start (a consumed raw
    # byte directly after an escape is never 0xFF unless escaped again, in
    # which case it belongs to the same run). Within a run starting at r,
    # escapes sit at even offsets and each consumes the following byte. ---
    is_start = np.ones(stream.size, dtype=bool)
    esc = stream == _ESCAPE
    if esc.any():
        idx = np.arange(stream.size)
        run_begin = esc & ~np.concatenate(([False], esc[:-1]))
        run_start_of = np.maximum.accumulate(np.where(run_begin, idx, -1))
        even_esc = esc & ((idx - run_start_of) % 2 == 0)
        consumed = np.flatnonzero(even_esc) + 1
        consumed = consumed[consumed < stream.size]
        is_start[consumed] = False

    starts = np.flatnonzero(is_start)
    sbytes = stream[starts]
    esc_code = sbytes == _ESCAPE
    out_lens = np.empty(starts.size, dtype=np.int64)
    out_lens[esc_code] = 1
    sym_mask = ~esc_code
    if sym_mask.any():
        out_lens[sym_mask] = table_lens[sbytes[sym_mask]]
    out_ends = np.cumsum(out_lens)
    out_starts = out_ends - out_lens
    out = np.empty(int(out_ends[-1]) if starts.size else 0, dtype=np.uint8)
    if esc_code.any():
        out[out_starts[esc_code]] = stream[starts[esc_code] + 1]
    if sym_mask.any():
        sym_codes = sbytes[sym_mask]
        lens = table_lens[sym_codes]
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        out[np.repeat(out_starts[sym_mask], lens) + within] = table_blob[
            np.repeat(t_starts[sym_codes], lens) + within
        ]

    # --- split back into strings via encoded byte lengths ---
    enc_ends = np.cumsum(byte_lens)
    str_out_ends = np.zeros(n, dtype=np.int64)
    nz = byte_lens > 0
    if stream.size and nz.any():
        code_of_byte = np.cumsum(is_start) - 1
        str_out_ends[nz] = out_ends[code_of_byte[enc_ends[nz] - 1]]
    np.maximum.accumulate(str_out_ends, out=str_out_ends)
    lengths = np.diff(np.concatenate(([0], str_out_ends)))
    return lengths, out


# ---------------------------------------------------------------------------
# plain / dict
# ---------------------------------------------------------------------------


def _plain_body(lengths: np.ndarray, data: np.ndarray) -> bytes:
    lb = encode_ints(lengths.astype(np.int64))
    return struct.pack("<I", len(lb)) + lb + data.tobytes()


def _plain_unbody(buf: memoryview, n: int) -> tuple[np.ndarray, np.ndarray]:
    (ll,) = struct.unpack_from("<I", buf, 0)
    lengths = decode_ints(buf[4 : 4 + ll]).astype(np.int64)
    data = np.frombuffer(buf[4 + ll :], dtype=np.uint8)
    return lengths, data


def _dict_encode_arrow(lengths: np.ndarray, data: np.ndarray):
    """pyarrow dictionary encode — vectorized C++; returns (codes, uq_lens, uq_data)."""
    arr = arrow_from_parts(lengths, data)
    denc = arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uq_lens, uq_data = parts_from_arrow(denc.dictionary)
    return codes, uq_lens, uq_data


def encode_strings(lengths: np.ndarray, data: np.ndarray,
                   codec: str | None = None) -> bytes:
    """Encode a string chunk from Arrow parts. Auto-selection when codec is
    None: dict when cardinality pays, else min(fsst, plain) by actual size
    (the plain fallback guards incompressible data)."""
    n = int(lengths.size)
    lengths = lengths.astype(np.int64, copy=False)
    candidates: dict[str, bytes] = {}

    want = {codec} if codec else {"dict", "fsst", "plain"}

    k = None
    if "dict" in want:
        codes, uq_lens, uq_data = _dict_encode_arrow(lengths, data)
        k = int(uq_lens.size)
        if codec == "dict" or k <= max(1, n // 2):
            dict_body = _plain_body(uq_lens, uq_data)
            codes_body = encode_ints(codes)
            body = (
                struct.pack("<III", k, len(dict_body), len(codes_body))
                + dict_body
                + codes_body
            )
            candidates["dict"] = _HDR.pack(DICT_STR, n) + body
    if "fsst" in want and (codec == "fsst" or "dict" not in candidates):
        candidates["fsst"] = _HDR.pack(FSST, n) + fsst_encode(lengths, data)
    if "plain" in want or codec is None:
        candidates["plain"] = _HDR.pack(PLAIN_STR, n) + _plain_body(lengths, data)

    if codec is not None:
        return candidates[codec]
    return min(candidates.values(), key=len)


def decode_strings(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Return (lengths int64[], utf8 uint8[])."""
    buf = memoryview(buf)
    cid, n = _HDR.unpack_from(buf, 0)
    body = buf[_HDR.size :]
    if cid == PLAIN_STR:
        return _plain_unbody(body, n)
    if cid == DICT_STR:
        k, dlen, clen = struct.unpack_from("<III", body, 0)
        uq_lens, uq_data = _plain_unbody(body[12 : 12 + dlen], k)
        codes = decode_ints(body[12 + dlen : 12 + dlen + clen]).astype(np.int64)
        starts = (np.cumsum(uq_lens) - uq_lens).astype(np.int64)
        lens = uq_lens[codes]
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        out = uq_data[np.repeat(starts[codes], lens) + within]
        return lens, out
    if cid == FSST:
        return fsst_decode(body, n)
    raise ValueError(cid)


def str_codec_name(buf: bytes | memoryview) -> str:
    return STR_CODECS[int(memoryview(buf)[0])]
