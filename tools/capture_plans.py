"""Dump .explain("formatted") for the bench queries to plans/<tag>/.

The optimization round's changes live below the Catalyst plan (codec
internals, task layout, planning-time file pruning), so before/after
plans are expected to be IDENTICAL for the library scan paths — these
files are the evidence for that claim. Run: python tools/capture_plans.py r06_after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/aisle_bench"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aisle_spark.filterspec import col
    from aisle_spark.pipeline import read_encoded, scan, scan_count
    from aisle_spark.datasource import register

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    enc = f"{WORK}/encoded"
    blocks, schema = read_encoded(spark, enc)
    spec_eq = col("source") == "code"
    spec_range = (col("n_tok").between(1000, 2000)) & (col("source") == "books")

    plans = {
        "scan_source_eq": scan(blocks, schema, where=spec_eq, columns=["doc_id", "n_tok"]).agg(
            F.count("*"), F.sum("n_tok")
        ),
        "scan_range_and_eq": scan(blocks, schema, where=spec_range).agg(
            F.count("*"), F.sum(F.size("tokens"))
        ),
        "decode_full": scan(blocks, schema).agg(F.count("*"), F.sum(F.size("tokens"))),
        "count_pushdown": scan_count(blocks, schema, where=col("n_tok") >= 1),
        "scan_point_chunkskip": scan(
            blocks, schema,
            where=(col("source") == "web") & (col("n_tok") == 777),
            columns=["doc_id", "n_tok"],
        ),
        "scan_source_eq_datasource": (
            spark.read.format("aisle").option("columns", "doc_id,n_tok,source")
            .load(enc).filter(F.col("source") == "code")
            .agg(F.count("*"), F.sum("n_tok"))
        ),
    }
    jvm = spark.sparkContext._jvm
    for name, df in plans.items():
        txt = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
