"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark AND its oracle_sql on DuckDB over the same
parquet, compare row counts, schemas (by sorted column names), and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].astype(str)
    if len(df) == 0:  # apply(axis=1) on empty returns a DataFrame
        rows = []
    else:
        rows = sorted(df.apply(lambda r: "\x1f".join(r.values), axis=1).tolist())
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01", only: str = "") -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        wanted = set(only.split(","))
        qs = {k: v for k, v in qs.items() if k in wanted}
    failures = 0
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(got)} (no oracle — rows-only check)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns))
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(exp)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(got)}/{len(exp)} schema={'ok' if ok_schema else sorted(got.columns)} hash={'ok' if ok_hash else 'MISMATCH'}"
        )
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
