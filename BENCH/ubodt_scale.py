#!/usr/bin/env python
"""Bench-scale UBODT build (VERDICT r5 item #3): build_ubodt with a bounded
thresh on a >=1M-vertex graph, launched standalone or via spark-submit
--py-files (the north-rule launch path).

Graph: W x H 4-neighbour grid (the road-network shape UBODT serves),
unit lengths, so thresh T admits all paths of cost <= T (T hops).
Deterministic, generated distributed (no driver materialization).

    python tools/build_pyfiles.py
    spark-submit --master local[32] --driver-memory 48g \
        --py-files dist/networkx_graph_spark.zip \
        BENCH/ubodt_scale.py [W] [H] [THRESH]

Prints one JSON line with rows, supersteps, wall seconds, rows/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    try:
        from networkx_graph_spark.session import get_spark
    except ImportError:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
        from networkx_graph_spark.session import get_spark

    from pyspark.sql import functions as F

    from networkx_graph_spark.graph import SparkDiGraph
    from networkx_graph_spark.operators.ubodt import build_ubodt

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="ubodt-scale")
    spark.sparkContext.setJobDescription(f"ubodt grid {w}x{h} thresh={thresh}")

    # 4-neighbour grid, both directions: id = y*w + x
    base = spark.range(0, w * h)
    yl = F.floor(F.col("id") / w)
    xl = F.col("id") % w
    right = base.filter(xl < w - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    down = base.filter(yl < h - 1).select(
        F.col("id").alias("src"), (F.col("id") + w).alias("dst")
    )
    edges = (
        right.unionByName(down)
        .unionByName(right.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .unionByName(down.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    )
    g = SparkDiGraph.from_edge_df(spark, edges)
    t0 = time.time()
    g.edges_w  # materialize the traversal table (build phase)
    t_build = time.time() - t0

    t0 = time.time()
    out = build_ubodt(g, thresh)
    n_rows = out.count()
    t_ubodt = time.time() - t0
    n_vertices = w * h
    print(
        json.dumps(
            {
                "grid": [w, h],
                "n_vertices": n_vertices,
                "n_edges": 2 * ((w - 1) * h + w * (h - 1)),
                "thresh": thresh,
                "ubodt_rows": n_rows,
                "rows_per_vertex": round(n_rows / n_vertices, 2),
                "graph_build_sec": round(t_build, 2),
                "ubodt_sec": round(t_ubodt, 2),
                "rows_per_sec": round(n_rows / t_ubodt, 1),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
