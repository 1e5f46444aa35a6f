"""spark-submit entry point (north rule shipping shape).

Usage:
  scripts/make_pyfiles.sh
  spark-submit --master local[8] \
      --py-files dist/arkouda_njit_spark.zip \
      scripts/submit_job.py [sf_dir]

Builds the part–supplier graph from `sf_dir` and prints the top-10
PageRank vertices plus component count — one JSON line, exercising the
engine exactly as a cluster job would (modules resolved from the zip on
the executors' python path, not from the repo checkout).
"""

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import connected_components, pagerank


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.appName("arkouda-njit-spark-submit-demo").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    g = Graph.from_edges(
        spark,
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
        num_partitions=16,
    )
    pr = pagerank(g, max_iterations=20)
    top = [
        (int(r["vid"]), round(float(r["rank"]), 8))
        for r in pr.orderBy(F.desc("rank"), "vid").limit(10).collect()
    ]
    n_comps = connected_components(g).select("component").distinct().count()
    print(json.dumps({"top10_pagerank": top, "n_components": n_comps,
                      "n_vertices": g.n_vertices, "n_edges": g.n_edges}))
    spark.stop()


if __name__ == "__main__":
    main()
