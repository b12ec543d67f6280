#!/usr/bin/env python3
"""aisle_spark benchmark — prints ONE JSON line.

Measures the north metric (BASELINE.json): tokens/sec encoded on the
synthetic pre-tokenized sequence table, compressed bytes vs Spark's own
parquet-zstd of the identical table, pruned-scan latencies, and (unless
AISLE_BENCH_SCALING=0) throughput at local[8] vs local[32] on identical
input — the sandbox stand-in for N- vs 4N-executor scaling efficiency.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir for table queries (default sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run           (default 32)
  AISLE_BENCH_ROWS     synthetic token-table rows       (default 400000)
  AISLE_BENCH_SCALING  1|0 run the local[8]/local[32] pair (default 1)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = "/tmp/aisle_bench"


def _session(master: str, shuffle: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName("aisle-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-Darrow.allocation.manager.type=Netty")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _parts_for(rows: int, cpus: int) -> int:
    # keep >=8 blocks per partition so in-partition sorting yields prunable
    # per-block ranges, but never fewer parts than cores (parallelism)
    from aisle_spark.pipeline import DEFAULT_BLOCK_ROWS

    return max(cpus, rows // (8 * DEFAULT_BLOCK_ROWS))


def _encode_job(spark, input_path: str, out_path: str, parts: int):
    """The measured unit: read -> inline encode -> salted block
    redistribution -> write (see encode_table_inline for why the raw-row
    shuffle variant is not the at-scale path)."""
    from aisle_spark.pipeline import encode_table_inline

    df = spark.read.parquet(input_path)
    blocks = encode_table_inline(df, parts=parts, sort_cols=["source", "n_tok"])
    shutil.rmtree(out_path, ignore_errors=True)
    blocks.write.mode("overwrite").option("compression", "none").parquet(out_path)


def scale_worker(master: str, input_path: str, out_path: str) -> None:
    cores = int(master.split("[")[1].rstrip("]"))
    spark = _session(master, cores)
    spark.sparkContext.setLogLevel("ERROR")
    df_rows = spark.read.parquet(input_path).count()  # warm up executors
    best = float("inf")
    for _ in range(3):  # best-of-3: hypervisor steal makes single runs noisy
        t0 = time.time()
        _encode_job(spark, input_path, out_path, parts=_parts_for(df_rows, 32))
        best = min(best, time.time() - t0)
    spark.stop()
    print(json.dumps({"wall": best}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("AISLE_BENCH_ROWS", "400000"))
    scaling = os.environ.get("AISLE_BENCH_SCALING", "1") == "1"
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    os.makedirs(WORK, exist_ok=True)
    queries: dict[str, float] = {}

    from pyspark.sql import functions as F

    from aisle_spark.filterspec import col
    from aisle_spark.pipeline import encode_table, read_encoded, scan
    from aisle_spark.schema import TOKEN_SCHEMA, synth_token_df

    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # --- input: deterministic synthetic token table (not timed) ---
    inp = f"{WORK}/input_{rows}.parquet"
    if not os.path.exists(inp):
        synth_token_df(spark, rows, slices=max(32, cpus * 2)).write.mode(
            "overwrite"
        ).parquet(inp)
    df = spark.read.parquet(inp)
    total_tokens = df.agg(F.sum("n_tok")).collect()[0][0]
    df.count()  # warm-up

    # --- encode throughput (the north metric) ---
    enc_path = f"{WORK}/encoded"
    t0 = time.time()
    _encode_job(spark, inp, enc_path, parts=_parts_for(rows, cpus))
    queries["encode_tokens"] = round(time.time() - t0, 3)
    from aisle_spark.pipeline import _write_schema_sidecar

    _write_schema_sidecar(enc_path, TOKEN_SCHEMA)
    tps = total_tokens / queries["encode_tokens"]

    # --- raw-row-shuffle encode variant (comparison; not the scale path) ---
    from aisle_spark.pipeline import encode_table as _encode_shuffle

    t0 = time.time()
    _encode_shuffle(
        df, parts=_parts_for(rows, cpus), sort_cols=["source", "n_tok"]
    ).selectExpr("sum(n_rows)").collect()
    queries["encode_tokens_rowshuffle"] = round(time.time() - t0, 3)

    # --- parquet-zstd reference of the same table ---
    ref_path = f"{WORK}/ref_zstd"
    t0 = time.time()
    df.write.mode("overwrite").parquet(ref_path)
    queries["parquet_zstd_write"] = round(time.time() - t0, 3)
    ours_bytes = _dir_bytes(enc_path)
    ref_bytes = _dir_bytes(ref_path)

    # --- pruned scans over the encoded table ---
    blocks, schema = read_encoded(spark, enc_path)
    blocks = blocks.cache()
    n_blocks = blocks.count()

    spec_eq = col("source") == "code"
    spec_range = (col("n_tok").between(1000, 2000)) & (col("source") == "books")
    kept_eq = blocks.filter(spec_eq.keep_blocks()).count()
    kept_range = blocks.filter(spec_range.keep_blocks()).count()

    t0 = time.time()
    scan(blocks, schema, where=spec_eq, columns=["doc_id", "n_tok"]).agg(
        F.count("*"), F.sum("n_tok")
    ).collect()
    queries["scan_source_eq"] = round(time.time() - t0, 3)

    t0 = time.time()
    scan(blocks, schema, where=spec_range).agg(
        F.count("*"), F.sum(F.size("tokens"))
    ).collect()
    queries["scan_range_and_eq"] = round(time.time() - t0, 3)

    t0 = time.time()
    scan(blocks, schema).agg(F.count("*"), F.sum(F.size("tokens"))).collect()
    queries["decode_full"] = round(time.time() - t0, 3)
    blocks.unpersist()

    # --- engine queries over driver testdata (documents) ---
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    dblocks = encode_table(docs, parts=max(16, cpus), sort_cols=["source", "n_chars"])
    dblocks = dblocks.cache()
    dblocks.count()
    queries["encode_documents"] = round(time.time() - t0, 3)
    from aisle_spark.pipeline import arrow_schema_of

    dschema = arrow_schema_of(docs)
    t0 = time.time()
    scan(
        dblocks,
        dschema,
        where=(col("n_chars").between(200, 400)) & (col("source") == "src3"),
        columns=["doc_id", "source", "n_chars"],
    ).count()
    queries["documents_pruned_scan"] = round(time.time() - t0, 3)
    dblocks.unpersist()
    spark.stop()

    # --- scaling: identical encode at local[8] vs local[32] ---
    scaling_out = {}
    if scaling:
        walls = {}
        for cores in (8, 32):
            confine = (
                ["taskset", "-c", f"0-{cores - 1}"]
                if os.path.exists("/usr/bin/taskset")
                else []
            )  # confine the WHOLE process tree (JVM+GC+python) to N cpus —
            # otherwise local[N] "borrows" spare host cores for JVM overhead
            # work and the small-N run is unfairly fast
            r = subprocess.run(
                [*confine, sys.executable, os.path.abspath(__file__), "--scale-worker",
                 f"local[{cores}]", inp, f"{WORK}/scale_{cores}"],
                capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            walls[cores] = json.loads(line).get("wall")
            queries[f"encode_local{cores}"] = round(walls[cores], 3)
        if walls.get(8) and walls.get(32):
            eff = (walls[8] / walls[32]) / (32 / 8)
            scaling_out = {
                "local8_tokens_per_sec": round(total_tokens / walls[8]),
                "local32_tokens_per_sec": round(total_tokens / walls[32]),
                "efficiency_8_to_32": round(eff, 3),
            }

    print(
        json.dumps(
            {
                "metric": "encode_tokens_per_sec",
                "value": round(tps),
                "unit": "tokens/sec",
                "sf": sf,
                "queries": queries,
                "rows": rows,
                "total_tokens": int(total_tokens),
                "compression": {
                    "encoded_bytes": ours_bytes,
                    "parquet_zstd_bytes": ref_bytes,
                    "ratio_vs_zstd": round(ours_bytes / ref_bytes, 4),
                },
                "pruning": {
                    "blocks_total": n_blocks,
                    "kept_source_eq": kept_eq,
                    "kept_range_and_eq": kept_range,
                },
                "scaling": scaling_out,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-worker":
        scale_worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
