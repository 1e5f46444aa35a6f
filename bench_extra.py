"""Round-6 optimization instrumentation (guide §1). NOT the frozen bench.

Same session profile and query set as bench.py, but each query is split
into labeled phases (spark.sparkContext.setJobDescription), timed with the
noop sink where a terminal count would let the optimizer prune work, and
the Spark UI REST API is scraped afterwards to attribute task time to
phases. Also captures .explain("formatted") for each headline query into
plans/r06/.

Usage:
  python bench_extra.py [--tag before|after] [--repeat N]

Writes /tmp/bench_extra_<tag>.json and plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = "before"
REPEAT = 1
if "--tag" in sys.argv:
    TAG = sys.argv[sys.argv.index("--tag") + 1]
if "--repeat" in sys.argv:
    REPEAT = int(sys.argv[sys.argv.index("--repeat") + 1])

PLANS_DIR = os.path.join(REPO, "plans", "r06")
os.makedirs(PLANS_DIR, exist_ok=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def save_plan(df, name):
    with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    from pyspark.sql import functions as F

    from arkouda_njit_spark.session import get_spark
    import bench

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    bench.warm_up(spark)

    phases: dict[str, list[float]] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        phases.setdefault(name, []).append(dt)
        sc.setJobDescription(None)
        return out

    from arkouda_njit_spark.functions import exact_duplicates, minhash_near_duplicates
    from arkouda_njit_spark.functions.dedup import (
        minhash_signatures,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from arkouda_njit_spark.operators import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from arkouda_njit_spark.operators.pagerank import prepare_pagerank
    from arkouda_njit_spark.operators.triangles import (
        _triangle_rows_cached,
    )
    from arkouda_njit_spark.sources import build_web_graph, generate_pages

    for rep in range(REPEAT):
        # ---- graph_build ------------------------------------------------
        ga, gb = timed("graph_build", lambda: bench.build_graphs(spark))
        if rep == 0:
            save_plan(ga.edges, "graph_build_edges")

        # ---- pagerank10 --------------------------------------------------
        prep = timed("pagerank_prepare", lambda: prepare_pagerank(ga))
        pr = timed(
            "pagerank10_iters",
            lambda: pagerank(ga, tol=0.0, max_iterations=10, prepared=prep),
        )
        timed("pagerank10_count", lambda: pr.count())
        if rep == 0:
            save_plan(pr, "pagerank10")
        prep[0].unpersist(); prep[1].unpersist()

        # ---- connected_components ---------------------------------------
        cc = timed("cc_run", lambda: connected_components(ga))
        timed("cc_count", lambda: cc.count())
        if rep == 0:
            save_plan(cc, "connected_components")

        # ---- lpa4 --------------------------------------------------------
        lp = timed("lpa4_run", lambda: label_propagation(ga, max_iterations=4))
        timed("lpa4_count", lambda: lp.count())

        # ---- triangle_count ---------------------------------------------
        def tri_phases():
            tri, handles = _triangle_rows_cached(gb)
            n = tri.count()
            for h in handles:
                h.unpersist()
            return n

        timed("triangle_count", tri_phases)
        if rep == 0:
            tri, handles = _triangle_rows_cached(gb)
            save_plan(tri, "triangle_count")
            for h in handles:
                h.unpersist()

        # ---- dedup family -----------------------------------------------
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            F.length(F.trim("text")) > 0
        )
        timed("exact_dedup", lambda: exact_duplicates(docs).count())

        sigs = timed(
            "minhash_sigs",
            lambda: minhash_signatures(docs, num_hashes=16).localCheckpoint(),
        )
        cands = timed(
            "minhash_lsh_cands",
            lambda: minhash_lsh_candidates(sigs, num_hashes=16, bands=8)
            .localCheckpoint(),
        )
        phases.setdefault("minhash_n_cands", []).append(cands.count())
        timed(
            "minhash_verify",
            lambda: ngram_jaccard_pairs(
                docs, threshold=0.7, candidates=cands, fallback_whole_text=True
            ).count(),
        )
        timed(
            "minhash_full",
            lambda: minhash_near_duplicates(
                docs, num_hashes=16, bands=8, threshold=0.7
            ).count(),
        )
        if rep == 0:
            save_plan(
                minhash_near_duplicates(docs, num_hashes=16, bands=8, threshold=0.7),
                "minhash_near_dup",
            )

        # ---- web pipeline ------------------------------------------------
        pages = timed(
            "web_gen_pages",
            lambda: generate_pages(spark, n_pages=20000, links_per_page=10, seed=42),
        )
        wg = timed("web_build_graph", lambda: build_web_graph(pages))
        wpr = timed(
            "web_pagerank5", lambda: pagerank(wg, tol=0.0, max_iterations=5)
        )
        timed("web_pagerank5_count", lambda: wpr.count())
        if rep == 0:
            save_plan(wpr, "web_pipeline")

        ga.unpersist(); gb.unpersist(); wg.unpersist()

    # ---- scrape the UI for per-stage task time --------------------------
    try:
        base = "http://localhost:4040/api/v1"
        apps = json.load(urllib.request.urlopen(f"{base}/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
        )
        agg: dict[str, dict] = {}
        for st in stages:
            desc = st.get("description") or "unlabeled"
            a = agg.setdefault(
                desc,
                {"stages": 0, "task_time_s": 0.0, "shuffle_write_mb": 0.0,
                 "shuffle_read_mb": 0.0, "input_mb": 0.0},
            )
            a["stages"] += 1
            a["task_time_s"] += st.get("executorRunTime", 0) / 1e3
            a["shuffle_write_mb"] += st.get("shuffleWriteBytes", 0) / 1e6
            a["shuffle_read_mb"] += st.get("shuffleReadBytes", 0) / 1e6
            a["input_mb"] += st.get("inputBytes", 0) / 1e6
    except Exception as e:  # UI scrape is best-effort
        agg = {"error": repr(e)}

    out = {
        "tag": TAG,
        "repeat": REPEAT,
        "phase_walls": {k: [round(x, 3) for x in v] for k, v in phases.items()},
        "stage_attribution": agg,
    }
    with open(f"/tmp/bench_extra_{TAG}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out["phase_walls"].items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
