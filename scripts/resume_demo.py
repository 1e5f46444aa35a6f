"""Resumability demonstration (north rule): kill a PageRank job mid-run,
restart it, verify it resumes from the persisted epoch and converges to
the same answer as an uninterrupted run.

Mechanics: run A executes PageRank with a checkpoint_dir in a subprocess
that is SIGKILLed after the first epochs land; run B (new JVM) calls the
same pagerank() — FixpointLoop.run finds the latest _SUCCESS-complete
epoch and continues from there (its metrics show the resumed start
iteration). A reference run C (no interruption) must match run B exactly.

Usage: python scripts/resume_demo.py   → prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from arkouda_njit_spark.session import get_spark
from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators.pagerank import pagerank

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(%(sf)r + "/lineitem.parquet")
g = Graph.from_edges(spark, li.select(
    F.col("l_partkey").alias("src"),
    (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
    F.lit(1.0).alias("weight")))
pr = pagerank(g, tol=0.0, max_iterations=%(iters)d, checkpoint_dir=%(ckpt)r)
top = pr.orderBy(F.desc("rank"), "vid").limit(5).collect()
print("RESULT " + repr([(r["vid"], round(r["rank"], 12)) for r in top]))
spark.stop()
"""


def spawn(ckpt: str, iters: int) -> subprocess.Popen:
    code = CHILD % {"repo": REPO, "sf": SF_DIR, "iters": iters, "ckpt": ckpt}
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )


def main():
    iters = 12
    work = tempfile.mkdtemp(prefix="resume_demo_")
    ckpt = os.path.join(work, "ckpt")

    # Run A: kill once the first epoch has been persisted.
    a = spawn(ckpt, iters)
    killed_at = None
    t0 = time.time()
    while time.time() - t0 < 600:
        epochs = [
            e for e in (os.listdir(ckpt) if os.path.isdir(ckpt) else [])
            if e.startswith("epoch=")
            and os.path.exists(os.path.join(ckpt, e, "_SUCCESS"))
        ]
        if len(epochs) >= 2:  # mid-algorithm: >=2 epochs durable, not done
            a.send_signal(signal.SIGKILL)
            killed_at = sorted(int(e.split("=")[1]) for e in epochs)[-1]
            break
        if a.poll() is not None:
            raise RuntimeError("run A finished before it could be killed")
        time.sleep(0.5)
    a.wait()

    # Snapshot the pre-crash metrics: run B must keep them as an untouched
    # prefix (resume reloads them; re-execution from 0 would duplicate).
    with open(os.path.join(ckpt, "metrics.json")) as f:
        pre_crash = json.load(f)
    pre_iters = [m["iteration"] for m in pre_crash]

    # Run B: same call, resumes from the last durable epoch.
    b = spawn(ckpt, iters)
    out_b, _ = b.communicate(timeout=900)
    result_b = [l for l in out_b.splitlines() if l.startswith("RESULT")][0]

    # Run C: uninterrupted reference in a fresh checkpoint dir.
    ckpt_c = os.path.join(work, "ckpt_c")
    c = spawn(ckpt_c, iters)
    out_c, _ = c.communicate(timeout=900)
    result_c = [l for l in out_c.splitlines() if l.startswith("RESULT")][0]

    ok = result_b == result_c
    metrics_path = os.path.join(ckpt, "metrics.json")
    with open(metrics_path) as f:
        final_metrics = json.load(f)
    final_iters = [m["iteration"] for m in final_metrics]
    # Evidence of a true mid-algorithm resume: the pre-crash metrics are an
    # untouched prefix (identical wall times — run B did not redo them), no
    # iteration appears twice, and the first NEW iteration is exactly
    # killed_at + 1.
    prefix_intact = final_metrics[: len(pre_crash)] == pre_crash
    no_duplicates = len(final_iters) == len(set(final_iters))
    new_iters = sorted(set(final_iters) - set(pre_iters))
    resumed_start = new_iters[0] if new_iters else None
    resumed_ok = (
        prefix_intact and no_duplicates and resumed_start == killed_at + 1
    )

    print(json.dumps({
        "killed_after_epoch": killed_at,
        "resumed_start_iteration": resumed_start,
        "pre_crash_prefix_intact": prefix_intact,
        "no_reexecuted_iterations": no_duplicates,
        "resumed_mid_algorithm": resumed_ok,
        "resumed_matches_uninterrupted": ok,
        "top5": result_b.removeprefix("RESULT "),
    }))
    ok = ok and resumed_ok
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
