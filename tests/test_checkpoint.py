"""F6 resume + F5 skew-balance fixtures."""

from __future__ import annotations

import pyarrow as pa
import pytest

from aisle_spark.checkpoint import (
    InjectedFailure,
    checkpoint_table,
    encode_resumable,
    lineage_metrics,
)
from aisle_spark.filterspec import col
from aisle_spark.pipeline import read_encoded, scan
from aisle_spark.schema import synth_batch


def _df(spark, n=4000):
    return spark.createDataFrame(pa.Table.from_batches([synth_batch(0, n)]))


def test_resume_after_injected_failure(spark, tmp_path):
    df = _df(spark)
    out_fail = str(tmp_path / "enc_fail")
    out_clean = str(tmp_path / "enc_clean")

    with pytest.raises(InjectedFailure):
        encode_resumable(df, out_fail, parts=8, groups=4, sort_cols=["source", "n_tok"],
                         fail_after=2)
    ck = checkpoint_table(spark, out_fail)
    assert ck.count() == 2  # two groups committed before the crash

    # resume: only the remaining groups run
    ran = encode_resumable(df, out_fail, parts=8, groups=4, sort_cols=["source", "n_tok"])
    assert ran == 2
    assert checkpoint_table(spark, out_fail).count() == 4

    # third run is a no-op
    assert encode_resumable(df, out_fail, parts=8, groups=4) == 0

    # final table identical to an uninterrupted run
    encode_resumable(df, out_clean, parts=8, groups=4, sort_cols=["source", "n_tok"])
    a_blocks, schema = read_encoded(spark, out_fail)
    b_blocks, _ = read_encoded(spark, out_clean)
    a = scan(a_blocks, schema).orderBy("doc_id").toPandas()
    b = scan(b_blocks, schema).orderBy("doc_id").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert list(x) == list(y)


def test_lineage_metrics_and_skew_balance(spark, tmp_path):
    df = _df(spark, 6000)
    out = str(tmp_path / "enc")
    encode_resumable(df, out, parts=8, groups=2, sort_cols=["source", "n_tok"])
    lin = lineage_metrics(spark, out).toPandas()
    assert len(lin) == 8  # one row per part
    assert lin["n_rows"].sum() == 6000
    assert (lin["enc_bytes"] > 0).all()
    # salted partitioning keeps raw bytes balanced despite 70% "web" rows
    # and zipf lengths: max part within 3x of min part
    assert lin["raw_bytes"].max() < 3 * lin["raw_bytes"].min()
    ck = checkpoint_table(spark, out).toPandas()
    assert ck["rows_per_sec"].min() > 0
