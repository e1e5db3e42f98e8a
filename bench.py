#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric for the north rule is PageRank edges/sec/superstep on
a deterministic power-law graph (hub-skewed, the salting/AQE stress case);
it is reported under extra.pagerank_edges_per_sec_per_superstep. The
scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/scaling_run.py -> BENCH/BASELINE.md.

Usage: python bench.py [--json-only] [--subset pagerank_powerlaw,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# power-law bench graph (FIXTURES.md §4): deterministic, hub-skewed
PL_VERTICES = int(os.environ.get("BENCH_PL_VERTICES", "1000000"))
PL_EDGES = int(os.environ.get("BENCH_PL_EDGES", "4000000"))
PR_ITERS = int(os.environ.get("BENCH_PR_ITERS", "10"))


def get_session():
    from networkx_graph_spark.session import get_spark

    # BENCH_SHUFFLE_PARTITIONS pins the partition count across parallelism
    # levels (the scaling experiment varies ONLY cores). Driver memory must
    # exceed the working set by a wide margin or GC dominates both levels
    # and masks core scaling (local mode = one JVM).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    parts = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", max(CPUS, 8)))
    return get_spark(app_name="nxg-bench", master=f"local[{CPUS}]",
                     shuffle_partitions=parts)


def bench_pagerank_powerlaw(spark, results):
    from pyspark.sql import functions as F

    from networkx_graph_spark.kernels.pagerank import pagerank
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    edges = powerlaw_edges(spark, PL_VERTICES, PL_EDGES).distinct().persist()
    n_edges = edges.count()
    t0 = time.time()
    res = pagerank(edges, tol=0.0, max_iter=PR_ITERS, fuse=2)
    dt = time.time() - t0
    checksum = res.state.agg(F.sum("rank")).collect()[0][0]
    edges.unpersist()
    results["extra"]["pagerank_powerlaw_edges"] = n_edges
    results["extra"]["pagerank_powerlaw_iters"] = res.iterations
    results["extra"]["pagerank_edges_per_sec_per_superstep"] = round(
        n_edges * res.iterations / dt, 1
    )
    results["extra"]["pagerank_rank_sum"] = checksum
    return dt


def bench_pagerank_powerlaw_16m(spark, results):
    """Larger-graph PageRank so edges/s/superstep is not dominated by fixed
    per-superstep job overhead (round-1 showed 313k e/s/s at 4M edges vs
    3.5-5M e/s/s at 64M — same engine, overhead-bound small graphs)."""
    from pyspark.sql import functions as F

    from networkx_graph_spark.kernels.pagerank import pagerank
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    n_v = int(os.environ.get("BENCH_PL2_VERTICES", "4000000"))
    n_e = int(os.environ.get("BENCH_PL2_EDGES", "16000000"))
    iters = int(os.environ.get("BENCH_PL2_ITERS", "5"))
    edges = powerlaw_edges(spark, n_v, n_e).distinct().persist()
    n_edges = edges.count()
    t0 = time.time()
    res = pagerank(edges, tol=0.0, max_iter=iters, fuse=2)
    dt = time.time() - t0
    checksum = res.state.agg(F.sum("rank")).collect()[0][0]
    edges.unpersist()
    results["extra"]["pagerank_16m_edges"] = n_edges
    results["extra"]["pagerank_16m_iters"] = res.iterations
    results["extra"]["pagerank_16m_edges_per_sec_per_superstep"] = round(
        n_edges * res.iterations / dt, 1
    )
    results["extra"]["pagerank_16m_rank_sum"] = checksum
    return dt


def bench_pagerank_tri_convergence(spark, results):
    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.kernels.pagerank import pagerank

    edges = tri_edges(spark, SF_DIR).persist()
    n_edges = edges.count()
    t0 = time.time()
    # partitions sized to the graph (~750k edges at sf0.1), not the core
    # count — the convergence run is superstep-latency-bound and oversized
    # stages only add scheduling overhead (PLANS.md "fusion depth")
    res = pagerank(edges, tol=1e-9, max_iter=60, fuse=2, num_partitions=16)
    dt = time.time() - t0
    edges.unpersist()
    results["extra"]["pagerank_tri_iters"] = res.iterations
    results["extra"]["pagerank_tri_converged"] = res.converged
    results["extra"]["pagerank_tri_edges"] = n_edges
    return dt


def bench_cc_powerlaw(spark, results):
    from networkx_graph_spark.kernels.components import connected_components
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    edges = powerlaw_edges(spark, PL_VERTICES, PL_EDGES // 4).distinct().persist()
    edges.count()
    t0 = time.time()
    res = connected_components(edges, algorithm="twophase", max_iter=30)
    n_comp = res.state.select("component").distinct().count()
    dt = time.time() - t0
    edges.unpersist()
    results["extra"]["cc_components"] = n_comp
    results["extra"]["cc_iters"] = res.iterations
    return dt


def bench_triangles_powerlaw(spark, results):
    from networkx_graph_spark.kernels.triangles import triangle_count
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    edges = powerlaw_edges(spark, 200_000, 1_000_000).persist()
    edges.count()
    t0 = time.time()
    n = triangle_count(edges)
    dt = time.time() - t0
    edges.unpersist()
    results["extra"]["n_triangles"] = n
    return dt


def bench_sssp_tri(spark, results):
    from pyspark.sql import functions as F

    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.graph import SparkDiGraph
    from networkx_graph_spark.operators.sssp import shortest_paths

    e = tri_edges(spark, SF_DIR)
    g = SparkDiGraph.from_edge_df(spark, e)
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").agg(
        F.min("o_custkey")
    ).collect()[0][0]
    t0 = time.time()
    gen = shortest_paths(g, str(src), cutoff=3.5)
    n = gen.dists_df().count()
    dt = time.time() - t0
    results["extra"]["sssp_reached"] = n
    g.unpersist()
    return dt


def bench_pages_ingest(spark, results):
    from networkx_graph_spark.sources.pages import pages_to_edges
    from networkx_graph_spark.sources.pages_synth import synth_pages

    n_pages = 20_000
    pages = synth_pages(spark, n_pages).persist()
    pages.count()
    t0 = time.time()
    n_edges = pages_to_edges(pages).count()
    dt = time.time() - t0
    pages.unpersist()
    results["extra"]["pages_ingested"] = n_pages
    results["extra"]["pages_per_sec"] = round(n_pages / dt, 1)
    results["extra"]["page_edges"] = n_edges
    return dt


def bench_minhash_dedup(spark, results):
    from networkx_graph_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    n = minhash_lsh_pairs(docs, threshold=0.2).count()
    dt = time.time() - t0
    results["extra"]["minhash_pairs"] = n
    return dt


def bench_cosine_topk(spark, results):
    from pyspark.sql import functions as F

    from networkx_graph_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    t0 = time.time()
    n = cosine_topk(emb, queries, k=10).count()
    dt = time.time() - t0
    results["extra"]["topk_rows"] = n
    return dt


def bench_revenue_agg(spark, results):
    from networkx_graph_spark.contract import q_revenue_agg

    t0 = time.time()
    q_revenue_agg(spark, SF_DIR).collect()
    return time.time() - t0


BENCHES = {
    "pagerank_powerlaw": bench_pagerank_powerlaw,
    "pagerank_16m": bench_pagerank_powerlaw_16m,
    "pagerank_tri": bench_pagerank_tri_convergence,
    "cc_powerlaw": bench_cc_powerlaw,
    "triangles_powerlaw": bench_triangles_powerlaw,
    "sssp_tri": bench_sssp_tri,
    "pages_ingest": bench_pages_ingest,
    "minhash_dedup": bench_minhash_dedup,
    "cosine_topk": bench_cosine_topk,
    "revenue_agg": bench_revenue_agg,
}

# The shared-VM wall clock swings ±40% run to run (NOTES_r1.md); the noisy
# round-over-round kernels get median-of-N interleaved samples (the
# scaling_run.py protocol), the rest one sample. Override: BENCH_RUNS=3.
MULTI_RUN = {
    "pagerank_powerlaw": 3,
    "pagerank_16m": 3,
    "pagerank_tri": 3,
    "cc_powerlaw": 3,
    "minhash_dedup": 3,
    "cosine_topk": 3,
    # the two queries most exposed to shared-host noise get extra samples:
    # they are short (2-13 s), so one external burst mid-sample flips the
    # median (r3 driver recorded 12.8 s sssp_tri / 2.4 s pages_ingest vs
    # 10.8 s / 1.15 s on the same code quiet-host)
    "sssp_tri": 5,
    "pages_ingest": 3,
}

# first-execution cache builders: one recorded-but-discarded warmup each
# (see main); medians are then median-of-warm
WARMUP_DISCARD = {"minhash_dedup", "cosine_topk", "pages_ingest"}


def main():
    import statistics

    subset = None
    for arg in sys.argv[1:]:
        if arg.startswith("--subset"):
            subset = arg.split("=", 1)[1].split(",")
    runs_override = os.environ.get("BENCH_RUNS")
    spark = get_session()
    results = {"queries": {}, "extra": {}}
    names = [n for n in BENCHES if not subset or n in subset]
    runs = {
        n: int(runs_override) if runs_override else MULTI_RUN.get(n, 1) for n in names
    }
    samples: dict[str, list] = {n: [] for n in names}
    # Warmup discipline (VERDICT r4 item 4): the short cache-building
    # queries pay a one-time cost on their first execution (Python/Arrow
    # worker spinup, parquet footer + OS page cache) that is engine-real
    # but not steady-state — r3/r4 medians whipsawed on whether that cold
    # sample landed in the middle (minhash_dedup: 7.4s cold vs 0.7s warm,
    # same code). One discarded-but-RECORDED warmup run per such query;
    # the median is median-of-warm.
    for name in names:
        if name in WARMUP_DISCARD and runs[name] > 1:
            dt = BENCHES[name](spark, results)
            results["extra"][f"{name}_warmup_sample"] = round(dt, 3)
            print(f"# {name}[warmup]: {dt:.2f}s (discarded)", file=sys.stderr)
    for rnd in range(max(runs.values(), default=1)):
        for name in names:  # interleaved: round-robin, not back-to-back
            if rnd >= runs[name]:
                continue
            dt = BENCHES[name](spark, results)
            samples[name].append(round(dt, 3))
            print(f"# {name}[{rnd}]: {dt:.2f}s", file=sys.stderr)
    total = 0.0
    for name in names:
        med = statistics.median(samples[name])
        results["queries"][name] = round(med, 3)
        total += med
        if len(samples[name]) > 1:
            results["extra"][f"{name}_samples"] = samples[name]
    try:
        # host-contention context for reading the numbers (the shared VM
        # swings ±40%: NOTES bench-noise protocol)
        results["extra"]["loadavg_end"] = open("/proc/loadavg").read().split()[:3]
    except OSError:
        pass
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results["queries"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "extra": results["extra"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
