"""Bloom-filter pruning: definite absence only, never a false skip
(mirrors /root/reference/tests/bloom_filter.rs assertions)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from aisle_spark.codecs.bloom import (
    bloom_may_contain,
    bloom_positions,
    build_bloom,
    blooms_absent_matrix,
    M_WORDS,
)
from aisle_spark.blocks import encode_block
from aisle_spark.filterspec import col
from aisle_spark.pipeline import encode_table, scan
from aisle_spark.schema import TOKEN_SCHEMA, specs_for_schema, synth_batch

RNG = np.random.default_rng(7)


def _parts(strings):
    data = "".join(strings).encode()
    lens = np.array([len(s.encode()) for s in strings], dtype=np.int64)
    return lens, np.frombuffer(data, dtype=np.uint8)


def test_no_false_negatives_ever():
    strings = [f"doc-{i:08x}" for i in range(5000)]
    bloom = build_bloom(*_parts(strings))
    for s in strings[::37]:
        assert bloom_may_contain(bloom, s.encode()), "false negative = wrong prune"


def test_absence_detected_mostly():
    strings = [f"doc-{i:08x}" for i in range(4096)]
    bloom = build_bloom(*_parts(strings))
    miss = sum(
        bloom_may_contain(bloom, f"other-{i:09x}".encode()) for i in range(2000)
    )
    assert miss / 2000 < 0.10  # fpp within design bounds


def test_absent_matrix_matches_scalar():
    strings = ["alpha", "beta", "gamma"]
    bloom = build_bloom(*_parts(strings)).reshape(1, M_WORDS)
    assert not blooms_absent_matrix(bloom, bloom_positions(b"beta"))[0]
    assert blooms_absent_matrix(bloom, bloom_positions(b"delta"))[0]


def test_blocks_store_bloom_for_high_card_strings():
    batch = synth_batch(0, 2048)
    specs = specs_for_schema(TOKEN_SCHEMA)
    row = encode_block(specs, batch, 0, 0)
    assert row["doc_id__bloom"] is not None and len(row["doc_id__bloom"]) == M_WORDS
    assert row["doc_id__dict"] is None
    assert row["source__bloom"] is None  # dict hint covers low-card source
    assert row["source__dict"] is not None


def test_doc_id_point_lookup_prunes_blocks(spark):
    df = spark.createDataFrame(pa.Table.from_batches([synth_batch(0, 4000)]))
    blocks = encode_table(df, parts=4, block_rows=512, sort_cols=["source", "n_tok"]).cache()
    total = blocks.count()
    target = df.select("doc_id").limit(1).collect()[0][0]
    spec = col("doc_id") == target
    kept = blocks.filter(spec.keep_blocks()).count()
    assert kept < total / 2  # bloom pruned most blocks
    out = scan(blocks, TOKEN_SCHEMA, where=spec).collect()
    assert len(out) == 1 and out[0].doc_id == target
    # absent key prunes everything but returns empty, not wrong
    spec2 = col("doc_id") == "no-such-doc"
    assert scan(blocks, TOKEN_SCHEMA, where=spec2).count() == 0
    blocks.unpersist()
