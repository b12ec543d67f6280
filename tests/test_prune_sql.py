"""Differential test of the DuckDB-dialect evidence predicates: for
randomized predicate trees (the same generator the Catalyst soundness
sweep uses) over one encoded manifest, ``prune_sql.keep_sql`` through
DuckDB must select exactly the block set ``filterspec.keep()`` selects
through Catalyst — both with evidence on and off."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from aisle_spark.filterspec import PruneOptions, col
from aisle_spark.pipeline import arrow_schema_of, encode_table, write_encoded
from aisle_spark.prune_sql import keep_sql
from aisle_spark.schema import TOKEN_SCHEMA, synth_batch

from tests.test_random_predicates import _rand_spec


@pytest.fixture(scope="module")
def manifest(spark, tmp_path_factory):
    """Encoded blocks both as a cached DataFrame (Catalyst side) and as a
    parquet directory (DuckDB side)."""
    df = spark.createDataFrame(pa.Table.from_batches([synth_batch(3, 3000)]))
    blocks = encode_table(
        df, parts=4, block_rows=256, sort_cols=["source", "n_tok"]
    ).cache()
    out = str(tmp_path_factory.mktemp("prunesql") / "enc")
    write_encoded(blocks, out, arrow_schema_of(df))
    return blocks, out


def _duck(out: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW m AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    return con


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_keep_sql_matches_catalyst(spark, manifest, seed):
    blocks, out = manifest
    con = _duck(out)
    rng = random.Random(seed)
    for _ in range(20):
        spec = _rand_spec(rng)
        for opts in (PruneOptions(), PruneOptions(use_dict=False, use_bloom=False)):
            cat = {
                r.block_id for r in blocks.filter(spec.keep(opts)).select("block_id").collect()
            }
            sql = keep_sql(spec, opts)
            duck = {
                r[0]
                for r in con.execute(
                    f"SELECT block_id FROM m WHERE {sql}"
                ).fetchall()
            }
            assert duck == cat, f"seed={seed} spec={spec!r}\nsql={sql}"


def test_keep_sql_typed_operands(spark, tmp_path):
    """Decimal, timestamp, date, duration, binary, map-key and nested
    struct leaves through both dialects."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    rows = []
    rng = random.Random(5)
    for i in range(2000):
        null = rng.random() < 0.06
        rows.append(
            (
                f"d{i:05d}",
                None if null else Decimal(rng.randrange(0, 100000)).scaleb(-2),
                None if null else dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                None if null else dt.date(2024, 1, 1) + dt.timedelta(days=i % 90),
                None if null else dt.timedelta(seconds=rng.randrange(0, 50000)),
                None if null else bytes([rng.randrange(65, 91) for _ in range(4)]),
                None if rng.random() < 0.1 else {"score": rng.randrange(100)},
                (rng.choice(["en", "de", "fr"]), f"s{i % 7}"),
            )
        )
    sch = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("price", T.DecimalType(12, 2)),
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("dur", T.DayTimeIntervalType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("src", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(rows, sch)
    blocks = encode_table(df, parts=2, block_rows=256, sort_cols=["id"]).cache()
    out = str(tmp_path / "enc")
    write_encoded(blocks, out, arrow_schema_of(df))
    con = _duck(out)

    specs = [
        col("price") > Decimal("333.33"),
        col("price").between(Decimal("100.00"), Decimal("200.00")),
        col("ts") >= dt.datetime(2024, 1, 1, 12, 0),
        ~(col("ts") < dt.datetime(2024, 1, 1, 6, 30)),
        col("d") == dt.date(2024, 2, 1),
        col("dur") <= dt.timedelta(seconds=20000),
        col("blob") >= b"MA",
        col("id").startswith("d001"),
        col("id").like("d00%"),
        col("id").like("%7"),  # residual-only Like: keep everything
        col("m").map_key("score") > 50,
        col("meta.lang") == "en",
        (col("meta.lang") == "de") | (col("price") < Decimal("50.00")),
        col("price").is_null(),
        col("blob").is_not_null() & (col("d") != dt.date(2024, 1, 5)),
    ]
    for spec in specs:
        cat = {
            r.block_id for r in blocks.filter(spec.keep()).select("block_id").collect()
        }
        sql = keep_sql(spec)
        duck = {r[0] for r in con.execute(f"SELECT block_id FROM m WHERE {sql}").fetchall()}
        assert duck == cat, f"spec={spec!r}\nsql={sql}"


def test_keep_sql_adversarial_strings(spark, tmp_path):
    """Values containing quotes/backslashes/unicode must render into valid
    DuckDB SQL selecting the same blocks as Catalyst."""
    from pyspark.sql import types as T

    nasty = ["o'brien", "100%", "back\\slash", "émoji🙂", "''", "plain"]
    rows = [(i, nasty[i % len(nasty)]) for i in range(600)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("id", T.LongType()), T.StructField("s", T.StringType())])
    )
    blocks = encode_table(df, parts=2, block_rows=64, sort_cols=["s"]).cache()
    out = str(tmp_path / "enc")
    write_encoded(blocks, out, arrow_schema_of(df))
    con = _duck(out)
    for v in nasty:
        for spec in (col("s") == v, col("s") != v, col("s").isin(v), col("s").startswith(v[:3])):
            cat = {r.block_id for r in blocks.filter(spec.keep()).select("block_id").collect()}
            duck = {
                r[0]
                for r in con.execute(
                    f"SELECT block_id FROM m WHERE {keep_sql(spec)}"
                ).fetchall()
            }
            assert duck == cat, f"{v!r} {spec!r}"
    blocks.unpersist()
