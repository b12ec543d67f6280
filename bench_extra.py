#!/usr/bin/env python3
"""Round-6 optimization harness — NOT the frozen driver bench.

Reuses the exact artifacts the driver bench builds under /tmp/aisle_bench
(input_400000.parquet + encoded/) to time each scan-path query in
isolation, count the task parallelism of each job, and dump
.explain("formatted") plans to plans/r06/.

Usage: python bench_extra.py [--queries q1,q2] [--plans]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = "/tmp/aisle_bench"


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aisle-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-Darrow.allocation.manager.type=Netty")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    want = set(args.queries.split(",")) if args.queries else None

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from aisle_spark.filterspec import col
    from aisle_spark.pipeline import (
        arrow_schema_of,
        encode_table,
        read_encoded,
        scan,
        scan_count,
    )

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    enc_path = f"{WORK}/encoded"
    inp = f"{WORK}/input_400000.parquet"
    df = spark.read.parquet(inp)
    df.count()

    blocks, schema = read_encoded(spark, enc_path)
    blocks = blocks.cache()
    n_blocks = blocks.count()
    print(f"blocks={n_blocks} partitions={blocks.rdd.getNumPartitions()}", flush=True)

    spec_eq = col("source") == "code"
    spec_range = (col("n_tok").between(1000, 2000)) & (col("source") == "books")
    target = df.select("doc_id").limit(1).collect()[0][0]

    from aisle_spark.datasource import register

    register(spark)

    def q_scan_source_eq():
        return scan(blocks, schema, where=spec_eq, columns=["doc_id", "n_tok"]).agg(
            F.count("*"), F.sum("n_tok")
        )

    def q_scan_range_and_eq():
        return scan(blocks, schema, where=spec_range).agg(
            F.count("*"), F.sum(F.size("tokens"))
        )

    def q_decode_full():
        return scan(blocks, schema).agg(F.count("*"), F.sum(F.size("tokens")))

    def q_count_pushdown():
        return scan_count(blocks, schema, where=col("n_tok") >= 1)

    def q_scan_doc_id_point():
        return scan(blocks, schema, where=col("doc_id") == target, columns=["doc_id", "n_tok"])

    def q_scan_point_chunkskip():
        return scan(
            blocks,
            schema,
            where=(col("source") == "web") & (col("n_tok") == 777),
            columns=["doc_id", "n_tok"],
        )

    def q_datasource():
        return (
            spark.read.format("aisle")
            .option("columns", "doc_id,n_tok,source")
            .load(enc_path)
            .filter(F.col("source") == "code")
            .agg(F.count("*"), F.sum("n_tok"))
        )

    queries = {
        "scan_source_eq": (q_scan_source_eq, "collect"),
        "scan_range_and_eq": (q_scan_range_and_eq, "collect"),
        "decode_full": (q_decode_full, "collect"),
        "count_pushdown": (q_count_pushdown, "collect"),
        "scan_doc_id_point": (q_scan_doc_id_point, "count"),
        "scan_point_chunkskip": (q_scan_point_chunkskip, "count"),
        "scan_source_eq_datasource": (q_datasource, "collect"),
    }

    # documents path (encode_table + pruned scan) from sf_dir
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dschema = arrow_schema_of(docs)

    out: dict[str, list[float]] = {}
    for name, (fn, action) in queries.items():
        if want and name not in want:
            continue
        walls = []
        for rep in range(args.reps):
            sc.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            q = fn()
            if action == "collect":
                q.collect()
            else:
                q.count()
            walls.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = walls
        print(f"{name}: {walls}", flush=True)
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_current.txt", "w") as fh:
                fh.write(fn()._jdf.queryExecution().explainString("formatted"))

    if not want or "encode_documents" in (want or set()):
        walls = []
        for rep in range(args.reps):
            sc.setJobDescription(f"encode_documents#{rep}")
            t0 = time.time()
            dblocks = encode_table(docs, parts=max(16, cpus), sort_cols=["source", "n_chars"])
            dblocks = dblocks.cache()
            dblocks.count()
            w = round(time.time() - t0, 3)
            walls.append(w)
            t0 = time.time()
            scan(
                dblocks,
                dschema,
                where=(col("n_chars").between(200, 400)) & (col("source") == "src3"),
                columns=["doc_id", "source", "n_chars"],
            ).count()
            out.setdefault("documents_pruned_scan", []).append(round(time.time() - t0, 3))
            dblocks.unpersist()
        out["encode_documents"] = walls
        print(f"encode_documents: {walls}", flush=True)
        print(f"documents_pruned_scan: {out['documents_pruned_scan']}", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
