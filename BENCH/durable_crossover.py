#!/usr/bin/env python
"""Measure the local cost of durable bucketed checkpoints vs plain
localCheckpoint for PageRank (the r3 verdict asked for a number behind
the "right default on a real cluster" claim).

Interleaved A/B samples (contention-robust: both arms see the same host)
on the deterministic power-law graph. Reports wall/superstep for each
mode plus bytes written per durable superstep, and the implied crossover:
durable mode pays (write+read) per superstep to DELETE the vertex-state
re-exchange that a restarted/multi-tenant cluster job would otherwise pay
per superstep — locally there is no restart, so the write is pure
overhead and the delta IS the premium being bought.

Usage: python BENCH/durable_crossover.py [n_vertices n_edges iters rounds]
Writes one JSON line; prose lands in PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main():
    from networkx_graph_spark.kernels.pagerank import pagerank
    from networkx_graph_spark.plans.supersteps import SuperstepRunner
    from networkx_graph_spark.session import get_spark
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", str(max(cpus, 8))))
    spark = get_spark(
        app_name="durable-crossover", master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = powerlaw_edges(spark, n_v, n_e).distinct().persist()
    n_edges = edges.count()

    local_walls, durable_walls, durable_bytes = [], [], []
    ckroot = tempfile.mkdtemp(prefix="durable_xover_")
    try:
        for rnd in range(rounds):  # interleaved A/B
            t0 = time.time()
            res = pagerank(edges, tol=0.0, max_iter=iters, fuse=1)
            local_walls.append(time.time() - t0)
            ranksum_local = sum(
                r["rank"] for r in res.state.collect()
            )

            d = os.path.join(ckroot, f"r{rnd}")
            runner = SuperstepRunner(
                spark, checkpoint_dir=d, bucket_cols=["id"], bucket_count=parts
            )
            t0 = time.time()
            res_d = pagerank(
                edges, tol=0.0, max_iter=iters, fuse=1,
                runner=runner, name="prx",
            )
            durable_walls.append(time.time() - t0)
            ranksum_durable = sum(r["rank"] for r in res_d.state.collect())
            durable_bytes.append(dir_bytes(d))
            assert abs(ranksum_local - ranksum_durable) < 1e-9, (
                ranksum_local, ranksum_durable,
            )
            for t in spark.catalog.listTables():
                if t.name.startswith("ckpt_"):
                    spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            print(
                f"# round {rnd}: local {local_walls[-1]:.1f}s, "
                f"durable {durable_walls[-1]:.1f}s, "
                f"{durable_bytes[-1] / 1e6:.0f} MB written",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(ckroot, ignore_errors=True)
    edges.unpersist()

    ml, md = statistics.median(local_walls), statistics.median(durable_walls)
    mb = statistics.median(durable_bytes)
    out = {
        "metric": "durable_checkpoint_crossover",
        "n_edges": n_edges,
        "iters": iters,
        "cpus": cpus,
        "local_wall_median_s": round(ml, 2),
        "durable_wall_median_s": round(md, 2),
        "local_s_per_superstep": round(ml / iters, 3),
        "durable_s_per_superstep": round(md / iters, 3),
        "durable_premium_s_per_superstep": round((md - ml) / iters, 3),
        "durable_mb_written_per_superstep": round(mb / 1e6 / iters, 1),
        "local_samples": [round(x, 2) for x in local_walls],
        "durable_samples": [round(x, 2) for x in durable_walls],
        "loadavg_end": open("/proc/loadavg").read().split()[:3],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
