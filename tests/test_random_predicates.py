"""Seeded randomized predicate soundness: for generated predicate trees of
every supported shape, the pruned+filtered engine scan must return exactly
the rows of a plain Spark filter — on one encoded table, in one Spark job
per batch (predicates are unioned via per-predicate counts)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from aisle_spark.filterspec import And, Cmp, InList, IsNull, Not, Or, Spec, StartsWith, col
from aisle_spark.pipeline import encode_table, scan
from aisle_spark.schema import TOKEN_SCHEMA, synth_batch

SOURCES = ["web", "books", "code", "wiki", "forums", "nope"]


def _rand_leaf(rng: random.Random) -> Spec:
    kind = rng.randrange(6)
    if kind == 0:
        op = rng.choice(["eq", "ne", "lt", "le", "gt", "ge"])
        return Cmp("n_tok", op, rng.randrange(0, 200))
    if kind == 1:
        return col("n_tok").between(rng.randrange(0, 50), rng.randrange(50, 300))
    if kind == 2:
        return Cmp("source", rng.choice(["eq", "ne"]), rng.choice(SOURCES))
    if kind == 3:
        return col("source").isin(*rng.sample(SOURCES, rng.randrange(1, 4)))
    if kind == 4:
        return col("doc_id").startswith(rng.choice(["web-", "c", "books-0", "zzz", ""]))
    return col("n_tok").is_not_null() if rng.random() < 0.5 else col("n_tok").is_null()


def _rand_spec(rng: random.Random, depth: int = 2) -> Spec:
    if depth == 0 or rng.random() < 0.35:
        return _rand_leaf(rng)
    k = rng.randrange(3)
    if k == 0:
        return And([_rand_spec(rng, depth - 1), _rand_spec(rng, depth - 1)])
    if k == 1:
        return Or([_rand_spec(rng, depth - 1), _rand_spec(rng, depth - 1)])
    return Not(_rand_spec(rng, depth - 1))


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_predicates_sound(spark, seed):
    rng = random.Random(seed)
    df = spark.createDataFrame(pa.Table.from_batches([synth_batch(0, 2500)])).cache()
    blocks = encode_table(df, parts=4, block_rows=256, sort_cols=["source", "n_tok"]).cache()
    blocks.count()
    for _ in range(10):
        spec = _rand_spec(rng)
        got = scan(blocks, TOKEN_SCHEMA, where=spec, columns=["doc_id"])
        exp = df.filter(spec.residual()).select("doc_id")
        g = {r.doc_id for r in got.collect()}
        e = {r.doc_id for r in exp.collect()}
        assert g == e, f"seed={seed} mismatch for {spec!r}: extra={g - e} missing={e - g}"
    blocks.unpersist()
    df.unpersist()
