"""Training-pipeline ops + multimodal plumbing tests (Spark side only;
the dual-dialect oracle equivalence is exercised by tools/check_oracle.py
and the driver gate)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def views(spark):
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").createOrReplaceTempView(t)
    return spark


def test_text_ops_run_and_agree_with_duckdb(views):
    import duckdb

    from aisle_spark.dataops import DATAOPS

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, (_view, sqlfn, has_oracle, spark_only) in DATAOPS.items():
        if not has_oracle:
            continue
        got = views.sql(sqlfn("spark")).toPandas()
        exp = con.execute(sqlfn("duckdb")).fetchdf()
        assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)}"
        key = sorted(got.columns)
        g = got[key].astype(str).apply("|".join, axis=1).sort_values().tolist()
        e = exp[key].astype(str).apply("|".join, axis=1).sort_values().tolist()
        assert g == e, f"{name}: value mismatch"


def test_simhash_pairs(views):
    from aisle_spark.dataops import _SIMHASH_HAMMING_MAX, simhash_pairs

    out = simhash_pairs(views).toPandas()
    # near-dup pairs exist in the corpus, all within the hamming band,
    # scalar columns only (driver canonicalizer cannot hash arrays)
    assert len(out) > 0
    assert out["hamming"].between(0, _SIMHASH_HAMMING_MAX).all()
    assert (out["doc_a"] < out["doc_b"]).all()
    assert not any(hasattr(v, "__len__") and not isinstance(v, str)
                   for v in out.iloc[0])


def test_ann_lsh_buckets(views):
    from aisle_spark.dataops import ann_lsh_buckets

    out = ann_lsh_buckets(views).toPandas()
    assert out["n_vectors"].sum() == 500
    assert out["bucket"].between(0, 255).all()
    # deterministic across invocations
    out2 = ann_lsh_buckets(views).toPandas()
    assert out.sort_values("bucket").equals(out2.sort_values("bucket"))


def test_ann_lsh_topk_is_equi_join(views):
    """The bucketed top-k must plan an equi-join (SortMergeJoin/
    BroadcastHashJoin), never a nested-loop cartesian (VERDICT r1 #2)."""
    from aisle_spark.dataops import DATAOPS

    sqlfn = DATAOPS["ann_lsh_topk"][1]
    df = views.sql(sqlfn("spark"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    out = df.toPandas()
    assert set(out["query_id"]) <= {0, 1, 2, 3}
    assert (out["rnk"] <= 5).all()


def test_multimodal_pipeline(spark):
    from aisle_spark.multimodal import (
        decode_media,
        extract_features,
        frame_sample,
        synth_media_df,
        FEATURE_DIM,
    )

    df = synth_media_df(spark, 500).cache()
    assert df.count() == 500
    feats = extract_features(df)
    row = feats.first()
    assert len(row.feature) == FEATURE_DIM
    # deterministic features regardless of partitioning
    a = feats.orderBy("media_id").toPandas()
    b = extract_features(df.repartition(7)).orderBy("media_id").toPandas()
    assert all(np.allclose(x, y) for x, y in zip(a.feature, b.feature))
    # frame sampling plumbing
    fs = frame_sample(df, every=4)
    assert fs.count() >= 500
    # real decode is stubbed in this environment
    payload = df.select("payload").first()[0]
    with pytest.raises(NotImplementedError):
        decode_media(bytes(payload), "image")
    df.unpersist()


def test_embeddings_roundtrip_through_engine(spark):
    from aisle_spark.pipeline import arrow_schema_of, encode_table, scan

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    blocks = encode_table(df, parts=4, sort_cols=["label", "vec_id"])
    out = scan(blocks, arrow_schema_of(df)).orderBy("vec_id").toPandas()
    exp = df.orderBy("vec_id").toPandas()
    assert out["vec_id"].tolist() == exp["vec_id"].tolist()
    for x, y in zip(out["embedding"], exp["embedding"]):
        assert np.array_equal(np.asarray(x, dtype=np.float32), np.asarray(y, dtype=np.float32))


def test_dedup_cosine_near_is_equi_join_and_sane(views):
    """Cosine near-dup verification runs only on LSH-bucket candidates:
    equi-join plan (never NestedLoop), symmetric-free pairs, cosine in
    [-1, 1] and above the threshold."""
    from aisle_spark.dataops import DATAOPS

    sqlfn = DATAOPS["dedup_cosine_near"][1]
    df = views.sql(sqlfn("spark"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    out = df.toPandas()
    assert (out["id_a"] < out["id_b"]).all()
    assert out["cos_sim"].between(0.30, 1.0 + 1e-9).all()


def test_fake_features_full_payload_sensitivity():
    # ADVICE r2 low: payloads sharing a 64-byte prefix and equal length
    # must still embed differently (whole-buffer digest, not prefix-only)
    import numpy as np
    import pandas as pd

    from aisle_spark.multimodal import _fake_features

    base = b"p" * 64
    a = base + b"A" * 100
    b = base + b"B" * 100
    feats = _fake_features(pd.Series([a, b, a]))
    assert not np.array_equal(feats[0], feats[1])
    assert np.array_equal(feats[0], feats[2])  # still deterministic
