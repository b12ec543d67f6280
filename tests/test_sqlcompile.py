"""SQL WHERE compiler: round-trip against Spec.to_sql for every shape the
randomized sweep generates, plus hand-written Spark-SQL-flavored inputs,
flip/precedence rules, and end-to-end scan equivalence."""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pytest

from aisle_spark.filterspec import (
    And,
    ArrayAny,
    ArrayLen,
    Between,
    Cmp,
    InList,
    IsNull,
    Like,
    MapKeyCmp,
    Not,
    Or,
    StartsWith,
    col,
)
from aisle_spark.sqlcompile import SqlCompileError, parse_where

from tests.test_random_predicates import _rand_spec


@pytest.mark.parametrize("seed", range(20))
def test_roundtrip_random_specs(seed):
    rng = random.Random(seed)
    for _ in range(25):
        spec = _rand_spec(rng, depth=3)
        sql = spec.to_sql()
        assert parse_where(sql) == spec, sql


def test_roundtrip_typed_literals():
    specs = [
        col("ts") > dt.datetime(2024, 1, 2, 3, 4, 5),
        col("d") == dt.date(2024, 5, 6),
        col("dur") <= dt.timedelta(seconds=90),
        col("b") >= b"\x41\x00\xff",
        col("price").between(10, 20),
        col("m").map_key("lang") == "en",
        ~(col("x").is_null() | col("s").like("a_b%")),
    ]
    for spec in specs:
        assert parse_where(spec.to_sql()) == spec, spec.to_sql()


class TestSparkFlavored:
    def test_basics(self):
        assert parse_where("n_tok >= 5") == Cmp("n_tok", "ge", 5)
        assert parse_where("source = 'web'") == Cmp("source", "eq", "web")
        assert parse_where("x != 3") == Cmp("x", "ne", 3)
        assert parse_where("x BETWEEN 1 AND 9") == Between("x", 1, 9)
        assert parse_where("s IN ('a','b')") == InList("s", ("a", "b"))
        assert parse_where("s NOT IN ('a')") == Not(InList("s", ("a",)))
        assert parse_where("x IS NOT NULL") == IsNull("x", negated=True)

    def test_lit_op_col_flip(self):
        assert parse_where("5 < x") == Cmp("x", "gt", 5)
        assert parse_where("'web' = source") == Cmp("source", "eq", "web")

    def test_precedence(self):
        got = parse_where("a = 1 OR b = 2 AND NOT c = 3")
        assert got == Or([Cmp("a", "eq", 1), And([Cmp("b", "eq", 2), Not(Cmp("c", "eq", 3))])])

    def test_like_classification(self):
        assert parse_where("s LIKE 'foo'") == Cmp("s", "eq", "foo")
        assert parse_where("s LIKE 'foo%'") == StartsWith("s", "foo")
        assert parse_where("s LIKE '%foo%'") == Like("s", "%foo%")
        assert parse_where("s NOT LIKE 'p%'") == Not(StartsWith("s", "p"))

    def test_array_and_map_functions(self):
        assert parse_where("array_contains(tokens, 42)") == ArrayAny("tokens", "eq", 42)
        assert parse_where("exists(tokens, x -> x > 9)") == ArrayAny("tokens", "gt", 9)
        assert parse_where("size(tokens) <= 30") == ArrayLen("tokens", "le", 30)
        assert parse_where("element_at(props, 'k') = 7") == MapKeyCmp("props", "k", "eq", 7)
        assert parse_where("try_element_at(props, 'k') > 1") == MapKeyCmp("props", "k", "gt", 1)
        assert parse_where("props['k'] <> 0") == MapKeyCmp("props", "k", "ne", 0)

    def test_dotted_and_quoted_identifiers(self):
        assert parse_where("meta.lang = 'en'") == Cmp("meta.lang", "eq", "en")
        assert parse_where('"meta.lang" = \'en\'') == Cmp("meta.lang", "eq", "en")
        assert parse_where("`meta.lang` = 'en'") == Cmp("meta.lang", "eq", "en")

    def test_errors(self):
        for bad in (
            "x ==",
            "x + 1 = 2",
            "func(x) = 1",
            "x LIKE 'a%' ESCAPE 'ab'",
            "x = 1 garbage",
            "(x = 1",
        ):
            with pytest.raises(SqlCompileError):
                parse_where(bad)


def test_scan_with_parsed_where_matches_builder(spark):
    """End-to-end: a parsed WHERE drives the same pruned scan the col()
    builder does."""
    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan
    from aisle_spark.schema import synth_batch

    df = spark.createDataFrame(pa.Table.from_batches([synth_batch(8, 2500)]))
    blocks = encode_table(df, parts=4, block_rows=256, sort_cols=["source", "n_tok"]).cache()
    schema = arrow_schema_of(df)
    sql = "source IN ('web','code') AND n_tok BETWEEN 20 AND 120 AND doc_id LIKE 'web-%'"
    spec = parse_where(sql)
    built = (
        col("source").isin("web", "code")
        & col("n_tok").between(20, 120)
        & col("doc_id").startswith("web-")
    )
    g = sorted(r.doc_id for r in scan(blocks, schema, where=spec, columns=["doc_id"]).collect())
    e = sorted(r.doc_id for r in scan(blocks, schema, where=built, columns=["doc_id"]).collect())
    e2 = sorted(
        r.doc_id
        for r in df.filter(
            "source IN ('web','code') AND n_tok BETWEEN 20 AND 120 AND doc_id LIKE 'web-%'"
        ).select("doc_id").collect()
    )
    assert g == e == e2 and g


class TestRegexp:
    def test_roundtrip_and_forms(self):
        from aisle_spark.filterspec import Regexp, col

        spec = col("s").rlike("^ab.*[0-9]$")
        assert parse_where(spec.to_sql()) == spec
        assert parse_where("s RLIKE '^a'") == Regexp("s", "^a")
        assert parse_where("NOT s RLIKE '^a'") == Not(Regexp("s", "^a"))

    def test_scan_rlike_exact(self, spark):
        import pyarrow as pa

        from aisle_spark.filterspec import col
        from aisle_spark.pipeline import arrow_schema_of, encode_table, scan
        from aisle_spark.schema import synth_batch

        df = spark.createDataFrame(pa.Table.from_batches([synth_batch(91, 1500)]))
        blocks = encode_table(df, parts=4, block_rows=256, sort_cols=["source"]).cache()
        schema = arrow_schema_of(df)
        spec = (col("source") == "web") & col("doc_id").rlike("0{2}[0-9]$")
        got = sorted(
            r.doc_id for r in scan(blocks, schema, where=spec, columns=["doc_id"]).collect()
        )
        exp = sorted(
            r.doc_id
            for r in df.filter(
                "source = 'web' AND doc_id RLIKE '0{2}[0-9]$'"
            ).collect()
        )
        assert got == exp and got
        blocks.unpersist()


def test_roundtrip_adversarial_literals():
    """Quotes, wildcards-as-data, backslashes, unicode, newlines — the
    to_sql escaping and the parser must agree on all of them."""
    from aisle_spark.filterspec import col

    nasty = ["o'brien", "100%", "a_b", "back\\slash", "new\nline", "tab\there",
             "émoji🙂", "''", "x'; DROP TABLE t; --"]
    for v in nasty:
        for spec in (
            col("s") == v,
            col("s").isin(v, "plain"),
            col("s") != v,
        ):
            assert parse_where(spec.to_sql()) == spec, spec.to_sql()
    # prefixes with wildcard characters AS DATA survive the LIKE escaping
    for p in ("pre%fix", "under_score", "mix%_ed", "o'quote"):
        spec = col("s").startswith(p)
        assert parse_where(spec.to_sql()) == spec, spec.to_sql()
