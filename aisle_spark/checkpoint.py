"""Resumable encode with per-partition lineage + metrics (north rule:
"writing per-partition lineage manifests and codec/size/throughput metrics
to a checkpoint table so any interrupted run resumes from the last
committed partition").

Layout under ``out_path``:
  grp=<g>/*.parquet    encoded block rows of ONE group (one atomic Spark
                       overwrite job per group; ``grp`` doubles as a
                       partition column for readers)
  _checkpoint/         parquet: one row per committed group
  _lineage/grp=<g>/    parquet: one row per committed part_id with block/
                       row/byte metrics (the skew audit — F5 uses this)
  _aisle_schema.arrow  input-schema sidecar

Resume = set difference on committed group ids (the degenerate —
and shuffle-free — form of the left-anti join the north rule names;
with millions of groups this becomes ``todo.join(done, "left_anti")``
on a groups DataFrame).

Idempotence (ADVICE r1): the checkpoint row is the ONLY commit point.
Data and lineage for group ``g`` land in group-exclusive directories with
mode=overwrite, so a crash anywhere before the checkpoint append simply
replays the group and REPLACES any partial or duplicate output — a flat
``spark.read.parquet(out_path)`` can never observe a group twice.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisle_spark.pipeline import (
    arrow_schema_of,
    encode_salted,
    with_part_id,
    _write_schema_sidecar,
)


class InjectedFailure(RuntimeError):
    """Raised by tests to simulate a mid-run crash (F6)."""


def _group_of(part_id_col, parts: int, groups: int):
    return F.floor(part_id_col * groups / parts).cast("int")


def encode_resumable(
    df: DataFrame,
    out_path: str,
    parts: int = 64,
    groups: int = 8,
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    block_rows: int | None = None,
    fail_after: int | None = None,
) -> int:
    """Encode ``df`` into ``out_path`` group-by-group, committing lineage
    after each group. Returns the number of groups encoded THIS run
    (0 when everything was already committed)."""
    spark = df.sparkSession
    ckpt = os.path.join(out_path, "_checkpoint")
    lineage = os.path.join(out_path, "_lineage")

    done: set[int] = set()
    if os.path.exists(ckpt):
        done = {
            r.group_id for r in spark.read.parquet(ckpt).select("group_id").collect()
        }
    todo = [g for g in range(groups) if g not in done]
    if not todo:
        return 0

    salted = with_part_id(df, parts, salt_cols).withColumn(
        "group_id", _group_of(F.col("part_id"), parts, groups)
    )

    kwargs = {}
    if block_rows is not None:
        kwargs["block_rows"] = block_rows

    ran = 0
    for g in todo:
        t0 = time.time()
        part = salted.filter(F.col("group_id") == g).drop("group_id")
        blocks = encode_salted(part, sort_cols=sort_cols, **kwargs)
        # group-exclusive dir + overwrite => crash replay REPLACES partial
        # output instead of appending a duplicate (ADVICE r1 medium)
        blocks.write.mode("overwrite").option("compression", "none").parquet(
            os.path.join(out_path, f"grp={g}")
        )
        wall = time.time() - t0

        # per-partition lineage + metrics from the just-committed GROUP dir
        # (reads exactly this group's blocks — no full-output relisting,
        # no floor-division drift vs _group_of; ADVICE r1 low)
        written = spark.read.parquet(os.path.join(out_path, f"grp={g}"))
        enc_cols = [c for c in written.columns if c.endswith("__enc_bytes")]
        raw_cols = [c for c in written.columns if c.endswith("__raw_bytes")]
        per_part = written.groupBy("part_id").agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_rows").alias("n_rows"),
            sum((F.sum(c) for c in enc_cols), F.lit(0)).alias("enc_bytes"),
            sum((F.sum(c) for c in raw_cols), F.lit(0)).alias("raw_bytes"),
        ).withColumn("group_id", F.lit(g))
        per_part.write.mode("overwrite").parquet(
            os.path.join(lineage, f"grp={g}")
        )

        agg = per_part.agg(
            F.count("*"), F.sum("n_rows"), F.sum("enc_bytes"), F.sum("raw_bytes")
        ).collect()[0]
        ck_row = [
            (
                int(g),
                int(agg[0] or 0),
                int(agg[1] or 0),
                int(agg[2] or 0),
                int(agg[3] or 0),
                float(wall),
                float((agg[1] or 0) / wall) if wall > 0 else 0.0,
            )
        ]
        spark.createDataFrame(
            ck_row,
            "group_id int, n_parts long, n_rows long, enc_bytes long, "
            "raw_bytes long, wall_sec double, rows_per_sec double",
        ).write.mode("append").parquet(ckpt)
        ran += 1
        if fail_after is not None and ran >= fail_after and g != todo[-1]:
            raise InjectedFailure(f"injected failure after {ran} groups")

    _write_schema_sidecar(out_path, arrow_schema_of(df))
    return ran


def lineage_metrics(spark: SparkSession, out_path: str) -> DataFrame:
    """Per-partition metrics table (block counts, rows, bytes)."""
    return spark.read.parquet(os.path.join(out_path, "_lineage"))


def checkpoint_table(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "_checkpoint"))
