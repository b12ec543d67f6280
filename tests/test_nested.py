"""Nested dotted-path predicates + struct round-trip — the engine's
analog of aisle's schema-path resolution (/root/reference/src/compile.rs:
369-518, exercised by tests/prune_nested.rs:47-113): struct columns are
flattened to dotted leaf columns (plus a ``.__defined`` validity leaf) at
encode, every per-leaf evidence kind (min/max, dict, bloom, chunk stats)
applies unchanged, and the reader reassembles StructArrays so residuals
run as Spark's native nested field access."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from aisle_spark.blocks import decode_block, encode_block
from aisle_spark.filterspec import col
from aisle_spark.schema import (
    assemble_struct,
    flatten_table,
    leaves_under,
    specs_for_schema,
)

META = pa.struct([pa.field("lang", pa.string()), pa.field("score", pa.int64())])
SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("meta", META)]
)


def _table(n=100, null_every=7):
    langs = ["en", "de", "fr", "es"]
    metas = [
        None if i % null_every == 0 else {"lang": langs[i % 4], "score": i}
        for i in range(n)
    ]
    return pa.Table.from_arrays(
        [
            pa.array([f"d{i:04d}" for i in range(n)]),
            pa.array(metas, type=META),
        ],
        schema=SCHEMA,
    )


def test_specs_flatten_with_defined_leaf():
    specs = specs_for_schema(SCHEMA)
    names = [s.name for s in specs]
    assert names == ["doc_id", "meta.__defined", "meta.lang", "meta.score"]


def test_flatten_nulls_leaves_under_null_struct():
    flat = flatten_table(_table(21, null_every=7))
    defined = flat.column("meta.__defined").to_pylist()
    lang = flat.column("meta.lang").to_pylist()
    for i in range(21):
        if i % 7 == 0:
            assert defined[i] is False and lang[i] is None
        else:
            assert defined[i] is True and lang[i] is not None


def test_block_roundtrip_reassembles_struct_exactly():
    tbl = _table(200)
    flat = flatten_table(tbl)
    specs = specs_for_schema(SCHEMA)
    row = encode_block(specs, flat, 0, 0)
    out = decode_block(specs, row)
    leaves = {n: out.column(i) for i, n in enumerate(out.schema.names)}
    arr, _t = assemble_struct(
        SCHEMA.field("meta"), "", leaves, set(leaves_under(SCHEMA, "meta"))
    )
    assert arr.to_pylist() == tbl.column("meta").to_pylist()


def test_nested_leaf_stats_and_pruning():
    flat = flatten_table(_table(200))
    specs = specs_for_schema(SCHEMA)
    row = encode_block(specs, flat, 0, 0)
    assert row["meta.lang__min"] == "de"
    assert row["meta.lang__max"] == "fr"
    assert row["meta.lang__nulls"] > 0  # null structs push nulls to leaves
    assert row["meta.score__max"] == 199


LMETA = pa.struct(
    [pa.field("lang", pa.string()), pa.field("toks", pa.list_(pa.int32()))]
)
LSCHEMA = pa.schema([pa.field("id", pa.int64()), pa.field("meta", LMETA)])


def _ltable(n=200, null_every=9):
    metas = [
        None
        if i % null_every == 0
        else {"lang": ["en", "de"][i % 2], "toks": list(range(i % 6))}
        for i in range(n)
    ]
    return pa.Table.from_arrays(
        [pa.array(np.arange(n)), pa.array(metas, type=LMETA)], schema=LSCHEMA
    )


def test_list_inside_struct_specs_and_roundtrip():
    """Lists under structs resolve like any other leaf (VERDICT r2 #3;
    /root/reference/src/compile.rs:369-518 visit_field resolution)."""
    specs = specs_for_schema(LSCHEMA)
    by = {s.name: s.kind for s in specs}
    assert by["meta.toks"] == "intlist"
    tbl = _ltable()
    flat = flatten_table(tbl)
    row = encode_block(specs, flat, 0, 0)
    assert row["meta.toks__elem_max"] == 4 and row["meta.toks__len_max"] == 5
    out = decode_block(specs, row)
    leaves = {n: out.column(i) for i, n in enumerate(out.schema.names)}
    arr, _t = assemble_struct(
        LSCHEMA.field("meta"), "", leaves, set(leaves_under(LSCHEMA, "meta"))
    )
    assert arr.to_pylist() == tbl.column("meta").to_pylist()


def test_map_inside_struct_roundtrip_and_predicate(spark):
    """Maps nested under structs: flatten canonicalizes children of NULL
    struct slots via take-with-null-indices (generic over child types),
    so the map leaf gets key-set + per-key stats like a top-level map."""
    from pyspark.sql import functions as F

    from aisle_spark.filterspec import col as fcol
    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(
            F.struct(
                (F.col("id") % 3).cast("string").alias("tag"),
                F.map_from_arrays(
                    F.array(F.concat(F.lit("key_"), (F.col("id") % 2).cast("string"))),
                    F.array(F.col("id")),
                ).alias("props"),
            )
        )
        .alias("meta"),
    )
    schema = arrow_schema_of(df)
    by = {s.name: s.kind for s in specs_for_schema(schema)}
    assert by["meta.props"] == "map"
    blocks = encode_table(df, parts=1, block_rows=256, sort_cols=["id"]).cache()
    spec = fcol("meta.props").map_key("key_1") >= 500
    got = sorted(r.id for r in scan(blocks, schema, where=spec, columns=["id"]).collect())
    exp = sorted(
        r.id
        for r in df.filter(
            F.try_element_at(F.col("meta.props"), F.lit("key_1")) >= 500
        ).select("id").collect()
    )
    assert got == exp and len(got) > 0
    # struct projection returns the nested map intact
    rt = {r.id: r.meta for r in scan(blocks, schema, columns=["id", "meta"]).collect()}
    exp_rt = {r.id: r.meta for r in df.collect()}
    assert rt == exp_rt
    blocks.unpersist()


def test_struct_list_predicate_end_to_end(spark):
    from pyspark.sql import functions as F

    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    df = spark.range(0, 1500).select(
        F.col("id"),
        F.when(F.col("id") % 9 == 0, None)
        .otherwise(
            F.struct(
                F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
                F.sequence(F.lit(1), (F.col("id") % 8 + 1).cast("int")).alias("toks"),
            )
        )
        .alias("meta"),
    )
    schema = arrow_schema_of(df)
    blocks = encode_table(df, parts=2, block_rows=256, sort_cols=["id"]).cache()
    cases = [
        (
            col("meta.toks").any_cmp("gt", 6),
            F.exists(F.col("meta.toks"), lambda x: x > 6),
        ),
        (
            col("meta.toks").size_cmp("ge", 7) & (col("meta.lang") == "L1"),
            (F.size(F.col("meta.toks")) >= 7) & (F.col("meta.lang") == "L1"),
        ),
    ]
    for spec, ref in cases:
        got = sorted(r.id for r in scan(blocks, schema, where=spec, columns=["id"]).collect())
        exp = sorted(r.id for r in df.filter(ref).select("id").collect())
        assert got == exp, f"{spec!r}"
    # projecting the struct returns lists nested inside it intact
    rt = {
        r.id: r.meta
        for r in scan(blocks, schema, columns=["id", "meta"]).collect()
    }
    exp = {r.id: r.meta for r in df.collect()}
    assert rt == exp
    blocks.unpersist()


def test_scan_nested_predicate_end_to_end(spark):
    from pyspark.sql import functions as F

    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    base = spark.createDataFrame(
        [(f"d{i:04d}", ["en", "de", "fr", "es"][i % 4], i) for i in range(2000)],
        "doc_id string, lang string, score long",
    )
    df = base.select(
        "doc_id",
        F.when(F.col("score") % 13 == 0, None)
        .otherwise(F.struct("lang", "score"))
        .alias("meta"),
    )
    schema = arrow_schema_of(df)
    blocks = encode_table(
        df, parts=2, block_rows=256, sort_cols=["meta.lang", "meta.score"]
    ).cache()
    total = blocks.count()
    spec = (col("meta.lang") == "de") & (col("meta.score") > 1000)
    kept = blocks.filter(spec.keep_blocks()).count()
    assert kept < total  # dotted-leaf stats prune
    exp = df.filter((F.col("meta.lang") == "de") & (F.col("meta.score") > 1000))
    got = scan(blocks, schema, where=spec, columns=["doc_id", "meta"])
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in exp.collect()
    )
    # whole-table round-trip incl. NULL structs
    full = scan(blocks, schema).orderBy("doc_id").collect()
    assert full == df.orderBy("doc_id").collect()
    blocks.unpersist()


class TestLeafProjection:
    """scan(columns=["meta.lang"]) decodes ONLY that leaf (+ validity
    chain) and yields a PARTIAL struct — the leaf-granular
    ProjectionMask semantics of the reference (r4)."""

    @pytest.fixture(scope="class")
    def encoded(self, spark):
        from aisle_spark.pipeline import encode_table

        tbl = _table(3000, null_every=7)
        df = spark.createDataFrame(tbl)
        blocks = encode_table(df, parts=2, block_rows=512).persist()
        blocks.count()
        yield df, blocks
        blocks.unpersist()

    def test_partial_struct_output(self, spark, encoded):
        from aisle_spark.pipeline import scan

        df, blocks = encoded
        got = scan(blocks, SCHEMA, columns=["doc_id", "meta.lang"])
        assert [f.name for f in got.schema.fields] == ["doc_id", "meta"]
        meta_t = dict(got.schema["meta"].dataType.jsonValue(), type=None)
        assert [f["name"] for f in meta_t["fields"]] == ["lang"]
        g = sorted(
            (r.doc_id, r.meta.lang if r.meta is not None else None)
            for r in got.collect()
        )
        e = sorted(
            (r.doc_id, r.meta.lang if r.meta is not None else None)
            for r in df.collect()
        )
        assert g == e  # incl. NULL structs preserved as NULL

    def test_untouched_leaf_payload_never_read(self, spark, encoded):
        """Dropping the un-projected leaf's payload column must not
        break the scan — proof the plan never references it."""
        from aisle_spark.pipeline import scan

        df, blocks = encoded
        crippled = blocks.drop("meta.score__payload")
        got = scan(crippled, SCHEMA, columns=["meta.lang"])
        assert got.count() == df.count()
        # whereas a full-struct projection genuinely needs it
        with pytest.raises(Exception):
            scan(crippled, SCHEMA, columns=["meta"]).count()

    def test_dotted_projection_with_predicate(self, spark, encoded):
        from aisle_spark.pipeline import scan

        df, blocks = encoded
        got = scan(
            blocks, SCHEMA, where=col("meta.score") > 1500,
            columns=["meta.lang"],
        )
        e = [r for r in df.collect() if r.meta is not None and r.meta.score > 1500]
        assert got.count() == len(e)

    def test_merged_partial_and_unknown_leaf(self, spark, encoded):
        from aisle_spark.pipeline import scan

        _df, blocks = encoded
        # two dotted leaves of the same struct merge into one struct
        got = scan(blocks, SCHEMA, columns=["meta.lang", "meta.score"])
        meta_t = got.schema["meta"].dataType
        assert [f.name for f in meta_t.fields] == ["lang", "score"]
        with pytest.raises(KeyError):
            scan(blocks, SCHEMA, columns=["meta.nope"])
        with pytest.raises(KeyError):
            scan(blocks, SCHEMA, columns=["doc_id.x"])
