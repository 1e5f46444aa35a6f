"""Plan hygiene: assert the physical plans the engine depends on at scale.

These tests read `.explain` output rather than timing, so they stay green
on any machine: predicate/projection pushdown reaches the parquet scan,
the iterative kernels never re-exchange the cached edge table, and
aggregations are map-side combined (partial aggregate before exchange).
"""

import contextlib
import io

from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators.pagerank import pagerank, prepare_pagerank
from arkouda_njit_spark.plans.joins import state_join_side

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_partkey")
    plan = _plan(q)
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters", 1)[1]
    # projection pruning: the scan's ReadSchema carries only the 2 columns
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_partkey" in read_schema
    assert "l_extendedprice" not in read_schema


def test_pagerank_iteration_plan_shape(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    g = Graph.from_edges(
        spark,
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
        num_partitions=8,
    )
    trans, dangling, has_dangling = prepare_pagerank(g)
    n = g.n_vertices
    state = g.vertices.select("vid", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    step = (
        trans.join(state_join_side(state.withColumnRenamed("vid", "src"), n), "src")
        .select(F.col("dst").alias("vid"), (F.col("p") * F.col("rank")).alias("c"))
        .unionAll(g.vertices.select("vid", F.lit(0.0).alias("c")))
        .groupBy("vid")
        .agg(F.sum("c").alias("c"))
    )
    plan = _plan(step)
    # the cached transition table is scanned in-memory and NEVER
    # re-shuffled: the only allowed exchanges are the state broadcast
    # (small-graph mode) and the aggregation's hashpartitioning(vid).
    assert "InMemoryTableScan" in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\((\w+)", plan):
        assert m.group(1) == "vid", f"unexpected shuffle on {m.group(1)}"
    # map-side combine: a partial_sum aggregate exists below the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    trans.unpersist()
    dangling.unpersist()


def test_state_join_strategy_dispatch(spark):
    small = spark.range(10).select(F.col("id").alias("vid"), F.lit(1.0).alias("rank"))
    hinted_small = state_join_side(small, n_vertices=10)
    hinted_big = state_join_side(small, n_vertices=10_000_000)
    # hints live in the logical plan string
    assert "broadcast" in hinted_small._jdf.queryExecution().logical().toString().lower()
    assert "shuffle_hash" in hinted_big._jdf.queryExecution().logical().toString().lower()
