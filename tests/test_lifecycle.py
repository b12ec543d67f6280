"""One end-to-end table lifecycle exercising the interactions between
round-4 features that unit suites cover separately: batch writes with
typed file stats, delta-encoded snapshots, compaction, snapshot expiry,
vacuum, time travel, a rate-limited stream catching up across all of it,
and stats-only aggregates on the final state — every step checked
against the plain-DataFrame truth."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aisle_spark.datasource import AisleStreamReader, register

BASE = "/tmp/aisle_lifecycle_test"


@pytest.fixture()
def env(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    register(spark)
    yield os.path.join(BASE, "t")
    shutil.rmtree(BASE, ignore_errors=True)


def test_full_table_lifecycle(spark, env):
    out = env
    df = spark.range(4000).selectExpr(
        "id",
        "timestamp'2024-06-01' + make_dt_interval(0, 0, cast(id as int), 0) AS ts",
        "cast(id % 97 + 0.50 as decimal(10,2)) AS amt",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE cast(id % 7 as int) END AS g",
    )

    # 1) four time-clustered appends -> v1..v4, delta snapshots after v1
    for q in range(4):
        df.filter(f"id >= {q * 1000} AND id < {(q + 1) * 1000}").repartition(
            1
        ).write.format("aisle").option("sortCols", "ts").mode("append").save(out)
    snap_dir = os.path.join(out, "_aisle_snapshots")
    on_disk = {
        v: json.load(open(os.path.join(snap_dir, f"v{v:08d}.json")))
        for v in (1, 2, 3, 4)
    }
    assert "delta_base" not in on_disk[1]
    assert all("delta_base" in on_disk[v] for v in (2, 3, 4))

    # 2) a rate-limited stream starts reading mid-history
    r = AisleStreamReader(out, max_files_per_trigger=1)
    seen: list[str] = []
    cur = r.initialOffset()
    for _ in range(40):
        nxt = r.latestOffset()
        if nxt == cur:
            break
        seen += [p.path for p in r.partitions(cur, nxt)]
        r.commit(nxt)
        cur = nxt
    assert len(seen) == len(set(seen)) == 4  # whole backfill, one file per batch

    # 3) compaction (range-clustered) + a fifth append AFTER it
    from aisle_spark.maintenance import (
        compact_encoded,
        expire_snapshots,
        vacuum_encoded,
    )

    compact_encoded(spark, out, target_files=2, order_by="ts")
    extra = spark.range(4000, 4400).selectExpr(
        "id",
        "timestamp'2024-06-01' + make_dt_interval(0, 0, cast(id as int), 0) AS ts",
        "cast(id % 97 + 0.50 as decimal(10,2)) AS amt",
        "cast(id % 7 as int) AS g",
    )
    extra.repartition(1).write.format("aisle").mode("append").save(out)

    # stream catches up: compaction contributes nothing, the append does
    more: list[str] = []
    for _ in range(40):
        nxt = r.latestOffset()
        if nxt == cur:
            break
        more += [p.path for p in r.partitions(cur, nxt)]
        r.commit(nxt)
        cur = nxt
    assert len(more) == 1  # exactly the new append's file

    # 4) time travel still reaches the pre-compaction version
    v4 = spark.read.format("aisle").option("versionAsOf", "4").load(out)
    assert v4.count() == 4000

    # 5) retention + vacuum: expire old snapshots, collect orphans
    victims = expire_snapshots(out, keep_last=2)
    assert victims  # something was actually expired
    removed = vacuum_encoded(out, min_age_seconds=0)
    assert removed  # pre-compaction files became collectible
    current = spark.read.format("aisle").load(out)
    assert current.count() == 4400
    with pytest.raises(Exception):
        # expired version now fails loudly (never silently wrong)
        spark.read.format("aisle").option("versionAsOf", "1").load(out).count()

    # 6) stats-only aggregates on the final state match the truth
    from aisle_spark.filterspec import col
    from aisle_spark.pipeline import (
        read_encoded,
        scan_count,
        scan_min_max,
        scan_sum,
    )

    truth = df.unionAll(extra)
    blocks, schema = read_encoded(spark, out)
    blocks = blocks.cache()
    assert scan_count(blocks, schema).collect()[0].cnt == 4400
    import datetime as dt

    utc = dt.timezone.utc
    cut = dt.datetime(2024, 6, 3, tzinfo=utc)
    n = scan_count(blocks, schema, where=col("ts") >= cut).collect()[0].cnt
    assert n == truth.filter(F.col("ts") >= "2024-06-03").count()
    s = scan_sum(blocks, schema, "amt").collect()[0].total
    assert s == truth.agg(F.sum("amt")).collect()[0][0]
    mm = scan_min_max(blocks, schema, "amt").collect()[0]
    e = truth.agg(F.min("amt").alias("mn"), F.max("amt").alias("mx")).collect()[0]
    assert (mm.mn, mm.mx) == (e.mn, e.mx)
    blocks.unpersist()
