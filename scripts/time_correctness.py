"""Per-query timing of the driver-style correctness compare at sf0.01.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB, in
registry order (the order the driver presumably iterates), printing wall
seconds for each side. Used to find queries at risk of falling off a
driver-side time budget."""
import json
import os
import sys
import time

import duckdb

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
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
t_total0 = time.time()
out = []
only = sys.argv[1:] or None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        rows = fn(spark, SF_DIR).collect()
        n = len(rows)
        t_spark = time.time() - t0
        err = ""
    except Exception as e:
        t_spark = time.time() - t0
        n = -1
        err = repr(e)[:120]
    t1 = time.time()
    n_o = -1
    if name in oracles and not err:
        try:
            n_o = len(con.execute(oracles[name]).fetchall())
        except Exception as e:
            err = "oracle:" + repr(e)[:120]
    t_duck = time.time() - t1
    out.append((name, t_spark, t_duck, n, n_o, err))
    print(f"{name:32s} spark={t_spark:7.2f}s duck={t_duck:7.2f}s rows={n}/{n_o} {err}", flush=True)
print(f"TOTAL {time.time()-t_total0:.1f}s")
json.dump([{"name": a, "spark_s": b, "duck_s": c} for a, b, c, *_ in out],
          open("/tmp/correctness_timing.json", "w"))
