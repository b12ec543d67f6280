"""Decimal operand support end-to-end (the reference prunes decimals,
/root/reference/src/prune/stats.rs:365-410, tests/decimal_support.rs):
unscaled-int64 codec path, exact Decimal stats, tri-state range pruning,
bit-exact Decimal128 reconstruction — no float rounding anywhere."""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

from aisle_spark.blocks import decode_block, encode_block
from aisle_spark.filterspec import col
from aisle_spark.schema import specs_for_schema

DEC = pa.decimal128(12, 2)


def _table(vals):
    schema = pa.schema([pa.field("price", DEC)])
    return specs_for_schema(schema), pa.Table.from_arrays(
        [pa.array(vals, type=DEC)], schema=schema
    )


def test_roundtrip_bit_identical_with_nulls():
    vals = [Decimal("0.01"), None, Decimal("-12345.67"), Decimal("9999999999.99"),
            Decimal("0.00"), Decimal("-0.01")]
    specs, tbl = _table(vals)
    row = encode_block(specs, tbl, 0, 0)
    out = decode_block(specs, row)
    assert out.column("price").to_pylist() == vals
    assert out.column("price").type == DEC


def test_stats_are_exact_decimals():
    vals = [Decimal("5.50"), Decimal("2.25"), Decimal("10.75"), None]
    specs, tbl = _table(vals)
    row = encode_block(specs, tbl, 0, 0)
    assert row["price__min"] == Decimal("2.25")
    assert row["price__max"] == Decimal("10.75")
    assert row["price__nulls"] == 1
    assert row["price__distinct"] == 3


def test_negative_values_roundtrip():
    rng = np.random.default_rng(9)
    vals = [Decimal(int(x)).scaleb(-2) for x in rng.integers(-10**9, 10**9, 5000)]
    specs, tbl = _table(vals)
    row = encode_block(specs, tbl, 0, 0)
    out = decode_block(specs, row)
    assert out.column("price").to_pylist() == vals


def test_precision_over_18_rejected():
    schema = pa.schema([pa.field("big", pa.decimal128(20, 2))])
    with pytest.raises(TypeError):
        specs_for_schema(schema)


def test_pruning_and_scan(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "id": np.arange(4000),
            "price": [Decimal(int(x)).scaleb(-2) for x in rng.integers(0, 10**6, 4000)],
        }
    )
    df = spark.createDataFrame(pdf, "id long, price decimal(12,2)")
    schema = arrow_schema_of(df)
    blocks = encode_table(df, parts=4, block_rows=512, sort_cols=["price"]).cache()
    total = blocks.count()
    spec = col("price").between(Decimal("100.00"), Decimal("200.00"))
    kept = blocks.filter(spec.keep_blocks()).count()
    assert kept < total  # sorted layout => range pruning bites
    out = scan(blocks, schema, where=spec).toPandas()
    exp = pdf[(pdf.price >= Decimal("100.00")) & (pdf.price <= Decimal("200.00"))]
    assert sorted(out.price.tolist()) == sorted(exp.price.tolist())
    # full table round-trips bit-exactly through Spark too
    full = scan(blocks, schema).toPandas().sort_values("id").reset_index(drop=True)
    assert full.price.tolist() == pdf.price.tolist()
    blocks.unpersist()
