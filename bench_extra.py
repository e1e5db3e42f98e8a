#!/usr/bin/env python
"""Phase-isolation benchmarks (guide §1.4): time kernel setup vs iteration
phases separately with the noop sink, outside the frozen bench.py.

Prints one JSON line: {"phases": {...}, "cpus": N, "sf_dir": ...}.

Usage: python bench_extra.py [phase,...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def phase_pagerank_16m_setup_vs_iters(spark, out):
    """Split pagerank_16m into edge-prep (outside pagerank), kernel call
    with 0 effective iterations (max_iter=1 approximates setup+1), and the
    full 5-iteration run — the difference isolates per-iteration cost."""
    from pyspark.sql import functions as F

    from networkx_graph_spark.kernels.pagerank import pagerank
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    spark.sparkContext.setJobDescription("pagerank16m: edge gen")
    edges = powerlaw_edges(spark, 4_000_000, 16_000_000).distinct().persist()
    edges.count()
    for iters, key in ((1, "pagerank_16m_setup_plus_1iter"), (5, "pagerank_16m_5iter")):
        spark.sparkContext.setJobDescription(f"pagerank16m: {key}")
        t0 = time.time()
        res = pagerank(edges, tol=0.0, max_iter=iters, fuse=2)
        res.state.agg(F.sum("rank")).collect()
        out[key] = round(time.time() - t0, 3)
    edges.unpersist()
    spark.sparkContext.setJobDescription(None)


def phase_triangles(spark, out):
    """Isolate orientation vs wedge-close phases."""
    from pyspark.sql import functions as F

    from networkx_graph_spark.kernels.triangles import _oriented
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    edges = powerlaw_edges(spark, 200_000, 1_000_000).persist()
    edges.count()
    spark.sparkContext.setJobDescription("triangles: orientation only")
    t0 = time.time()
    o = _oriented(edges)
    noop(o)
    out["triangles_orient"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription("triangles: full count")
    from networkx_graph_spark.kernels.triangles import triangle_count

    t0 = time.time()
    n = triangle_count(edges)
    out["triangles_full"] = round(time.time() - t0, 3)
    out["triangles_n"] = n
    edges.unpersist()
    spark.sparkContext.setJobDescription(None)


def phase_sssp_tri(spark, out):
    """Isolate graph-prep (vertex cache + edges_w) vs kernel supersteps."""
    from pyspark.sql import functions as F

    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.graph import SparkDiGraph
    from networkx_graph_spark.operators.sssp import shortest_paths

    e = tri_edges(spark, SF_DIR)
    g = SparkDiGraph.from_edge_df(spark, e)
    src = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .agg(F.min("o_custkey"))
        .collect()[0][0]
    )
    spark.sparkContext.setJobDescription("sssp_tri: graph prep")
    t0 = time.time()
    g.node_id(str(src))
    g.lengths_map
    g.edges_w
    out["sssp_tri_prep"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription("sssp_tri: kernel")
    t0 = time.time()
    gen = shortest_paths(g, str(src), cutoff=3.5)
    out["sssp_tri_reached"] = gen.dists_df().count()
    out["sssp_tri_kernel"] = round(time.time() - t0, 3)
    g.unpersist()
    spark.sparkContext.setJobDescription(None)


def phase_cosine(spark, out):
    """Noop-sink the scored scan vs the full two-stage top-k."""
    from pyspark.sql import functions as F

    from networkx_graph_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    spark.sparkContext.setJobDescription("cosine: warm")
    cosine_topk(emb, queries, k=10).count()
    spark.sparkContext.setJobDescription("cosine: full")
    t0 = time.time()
    noop(cosine_topk(emb, queries, k=10))
    out["cosine_topk_noop"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)


PHASES = {
    "pagerank": phase_pagerank_16m_setup_vs_iters,
    "triangles": phase_triangles,
    "sssp": phase_sssp_tri,
    "cosine": phase_cosine,
}


def main():
    from networkx_graph_spark.session import get_spark

    subset = sys.argv[1].split(",") if len(sys.argv) > 1 else list(PHASES)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="nxg-bench-extra", master=f"local[{CPUS}]")
    out: dict = {}
    for name in subset:
        PHASES[name](spark, out)
        print(f"# {name}: done {out}", file=sys.stderr)
    print(json.dumps({"phases": out, "cpus": CPUS, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
