"""Local replica of the driver's correctness compare (CORRECTNESS_r{N}).

For every ``queries()`` entry with an ``oracle_sql()`` entry: run the Spark
query and the DuckDB oracle at SF_DIR, sort columns by name, canonicalize
rows with pandas ``sort_values`` over all columns (the driver's observed
canonicalizer — it THROWS on unhashable cells like lists, which is exactly
the r3 ``suffix_array`` failure mode, so running this locally catches that
class before the driver does), round floats, and hash the values.

Usage: python scripts/driver_compare.py [query ...]   # default: all
Env:   SF_DIR (default /root/testdata/sf0.01)
"""
import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    # stringify cell-by-cell the way a hasher would see it
    body = df.astype(str).to_csv(index=False)
    return hashlib.md5(body.encode()).hexdigest()


qs = entrymod.queries()
oracles = entrymod.oracle_sql()
only = set(sys.argv[1:]) or None
n_pass = n_fail = n_skip = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    if name not in oracles:
        print(f"{name:32s} SKIP (no oracle — rows-only in driver)")
        n_skip += 1
        continue
    try:
        sdf = fn(spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = cols_ok and rows_ok and canon(sdf) == canon(odf)
        ok = cols_ok and rows_ok and hash_ok
        n_pass += ok
        n_fail += not ok
        tag = "PASS" if ok else "FAIL"
        detail = "" if ok else (
            f" cols={cols_ok}({sorted(sdf.columns)}vs{sorted(odf.columns)})"
            f" rows={len(sdf)}/{len(odf)} hash={hash_ok}"
        )
        print(f"{name:32s} {tag} rows={len(sdf)}{detail}", flush=True)
    except Exception as e:
        n_fail += 1
        print(f"{name:32s} ERR {repr(e)[:300]}", flush=True)
print(f"pass={n_pass} fail={n_fail} skip={n_skip} total={len(only or qs)}")
sys.exit(1 if n_fail else 0)
