"""Binary / FixedSizeBinary / Duration operand support — the remaining
stats-extraction types the reference prunes on
(/root/reference/src/prune/stats.rs:222-278, tests/time_support.rs)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from aisle_spark.blocks import decode_block, encode_block
from aisle_spark.filterspec import col
from aisle_spark.schema import specs_for_schema


def _roundtrip(values, typ):
    schema = pa.schema([pa.field("x", typ)])
    specs = specs_for_schema(schema)
    tbl = pa.Table.from_arrays([pa.array(values, type=typ)], schema=schema)
    row = encode_block(specs, tbl, 0, 0)
    out = decode_block(specs, row)
    return row, out.column("x")


def test_binary_roundtrip_and_stats():
    vals = [b"beta", b"alpha", None, b"\x00\xff\x80", b"zz"]
    row, out = _roundtrip(vals, pa.binary())
    assert out.to_pylist() == vals
    assert row["x__min"] == b"\x00\xff\x80"
    assert row["x__max"] == b"zz"
    assert row["x__nulls"] == 1
    assert set(row["x__dict"]) == {b"beta", b"alpha", b"\x00\xff\x80", b"zz"}


def test_fixed_size_binary_roundtrip():
    vals = [b"abcd", None, b"\x01\x02\x03\x04", b"zzzz"]
    _row, out = _roundtrip(vals, pa.binary(4))
    assert out.type == pa.binary(4)
    assert out.to_pylist() == vals


def test_binary_bloom_for_high_cardinality():
    vals = [f"k{i:06d}".encode() for i in range(4096)]
    row, out = _roundtrip(vals, pa.binary())
    assert row["x__dict"] is None and row["x__bloom"] is not None
    assert out.to_pylist() == vals


def test_duration_roundtrip_and_stats():
    vals = [dt.timedelta(seconds=5), None, dt.timedelta(days=-1),
            dt.timedelta(microseconds=1)]
    row, out = _roundtrip(vals, pa.duration("us"))
    assert out.to_pylist() == vals
    assert row["x__min"] == dt.timedelta(days=-1)
    assert row["x__max"] == dt.timedelta(seconds=5)


def test_duration_scan_pruning(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    rows = [(i, dt.timedelta(seconds=i * 10)) for i in range(2000)]
    sch = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("dur", T.DayTimeIntervalType()),
        ]
    )
    df = spark.createDataFrame(rows, sch)
    schema = arrow_schema_of(df)
    blocks = encode_table(df, parts=2, block_rows=256, sort_cols=["dur"]).cache()
    total = blocks.count()
    spec = col("dur").between(
        dt.timedelta(seconds=5000), dt.timedelta(seconds=6000)
    )
    kept = blocks.filter(spec.keep_blocks()).count()
    assert kept < total
    got = scan(blocks, schema, where=spec).count()
    assert got == 101  # seconds 5000..6000 step 10 inclusive
    blocks.unpersist()


def test_binary_scan_range(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    rows = [(i, bytes([65 + i % 26]) * 3) for i in range(2000)]
    sch = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("b", T.BinaryType())]
    )
    df = spark.createDataFrame(rows, sch)
    schema = arrow_schema_of(df)
    blocks = encode_table(df, parts=2, block_rows=256, sort_cols=["b"]).cache()
    spec = (col("b") >= b"C") & (col("b") < b"F")
    got = scan(blocks, schema, where=spec).count()
    exp = df.filter((F.col("b") >= F.lit(b"C")) & (F.col("b") < F.lit(b"F"))).count()
    assert got == exp
    blocks.unpersist()
