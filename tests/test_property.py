"""Property-based round-trip tests (hypothesis): for ANY input, every codec
path must reproduce it bit-identically — the token-array-equality invariant
as a law, not a fixture."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from aisle_spark.blocks import decode_column, encode_column
from aisle_spark.codecs.ints import INT_CODECS, decode_ints, encode_ints
from aisle_spark.codecs.strings import decode_strings, encode_strings
from aisle_spark.schema import spec_for_field

_int_arrays = st.one_of(
    st.lists(st.integers(-(2**31), 2**31 - 1), max_size=300).map(
        lambda v: np.array(v, dtype=np.int32)
    ),
    st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300).map(
        lambda v: np.array(v, dtype=np.int64)
    ),
    # run-heavy arrays
    st.lists(st.tuples(st.integers(0, 50), st.integers(1, 40)), max_size=30).map(
        lambda runs: np.repeat(
            np.array([v for v, _ in runs], dtype=np.int32),
            np.array([n for _, n in runs], dtype=np.int64),
        )
        if runs
        else np.array([], dtype=np.int32)
    ),
)


@settings(max_examples=150, deadline=None)
@given(arr=_int_arrays, codec=st.sampled_from([None, *INT_CODECS.values()]))
def test_int_codecs_roundtrip_any_input(arr, codec):
    out = decode_ints(encode_ints(arr, codec))
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=80, deadline=None)
@given(
    strings=st.lists(st.text(max_size=60), max_size=120),
    codec=st.sampled_from([None, "plain", "dict", "fsst"]),
)
def test_string_codecs_roundtrip_any_input(strings, codec):
    data = "".join(strings).encode("utf-8")
    lengths = np.array([len(s.encode("utf-8")) for s in strings], dtype=np.int64)
    out_lens, out_data = decode_strings(
        encode_strings(lengths, np.frombuffer(data, dtype=np.uint8), codec)
    )
    np.testing.assert_array_equal(out_lens, lengths)
    np.testing.assert_array_equal(out_data, np.frombuffer(data, dtype=np.uint8))


@settings(max_examples=60, deadline=None)
@given(
    lists=st.lists(
        st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31 - 1), max_size=40)),
        max_size=60,
    )
)
def test_intlist_column_roundtrip_any_input(lists):
    arr = pa.array(lists, type=pa.list_(pa.int32()))
    spec = spec_for_field(pa.field("c", pa.list_(pa.int32())))
    enc = encode_column(spec, arr)
    out = decode_column(spec, enc["c__payload"])
    assert out.equals(arr)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=80,
    )
)
def test_float_column_roundtrip_any_input(vals):
    arr = pa.array(vals, type=pa.float64())
    spec = spec_for_field(pa.field("c", pa.float64()))
    enc = encode_column(spec, arr)
    out = decode_column(spec, enc["c__payload"])
    assert out.is_valid().equals(arr.is_valid())
    a = out.drop_null().to_numpy(zero_copy_only=False)
    b = arr.drop_null().to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(a.view(np.uint8), b.view(np.uint8))
