#!/usr/bin/env python
"""Probe: split pagerank_tri's per-sub-iteration cost into
plan-construction (py4j), Catalyst (analysis->physical), action execution,
and Observation.get latency; plus stage-level task-time vs stage wall from
the REST API for the superstep job.

Usage: python BENCH/r06/probe_tri_phases.py
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.kernels.pagerank import pagerank
    from networkx_graph_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="probe-tri-phases",
        master=f"local[{CPUS}]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "true"},
    )
    edges = tri_edges(spark, SF_DIR).persist()
    edges.count()
    # Warm the kernel (cache build, codegen) then replicate ONE sub-iteration
    # manually with the same conf posture the kernel uses.
    res = pagerank(edges, tol=1e-9, max_iter=4, fuse=2, num_partitions=16)
    n = res.state.count()

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    from pyspark.sql import Window

    dedup = edges.select("src", "dst").repartition(16, "src").dropDuplicates(["src", "dst"])
    cedges = dedup.select(
        "src",
        "dst",
        (F.lit(1.0) / F.count("*").over(Window.partitionBy("src"))).alias("inv_deg"),
    ).persist()
    cedges.count()
    state = (
        cedges.select(F.col("src").alias("id"))
        .unionByName(cedges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.max(F.lit(True)).alias("_ho"))
        .select("id", F.lit(1.0 / n).alias("rank"), F.lit(False).alias("dangling"))
        .sortWithinPartitions("id")
        .localCheckpoint(eager=True)
    )

    rounds = []
    for it in range(8):
        t0 = time.time()
        ce = cedges.select(
            F.col("src").alias("_csrc"),
            F.col("dst").alias("_cdst"),
            F.col("inv_deg").alias("_cinv"),
        )
        contribs = (
            state.join(ce, state["id"] == F.col("_csrc"))
            .select(F.col("_cdst").alias("id"), (state["rank"] * F.col("_cinv")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("_c"))
        )
        upd = (
            state.select("id", F.col("rank").alias("prev_rank"), "dangling")
            .join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * (F.lit(0.0) + F.coalesce(F.col("_c"), F.lit(0.0)))
                ).alias("rank"),
                "prev_rank",
                "dangling",
            )
        )
        obs = Observation()
        upd = upd.observe(
            obs,
            F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
            F.coalesce(F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)).alias("dm"),
        ).select("id", "rank", "dangling")
        t1 = time.time()  # plan construction done
        # force Catalyst: analysis + optimization + physical planning + codegen prep
        upd._jdf.queryExecution().executedPlan()
        t2 = time.time()
        new_state = upd.localCheckpoint(eager=True)
        t3 = time.time()
        got = obs.get
        t4 = time.time()
        rounds.append(
            {
                "build": round(t1 - t0, 4),
                "catalyst": round(t2 - t1, 4),
                "action": round(t3 - t2, 4),
                "obs_get": round(t4 - t3, 4),
                "total": round(t4 - t0, 4),
            }
        )
        state = new_state

    print(json.dumps(rounds, indent=1))

    # stage-level for the LAST action's job
    base = "http://localhost:4040/api/v1"
    app_id = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete"))
    recent = sorted(stages, key=lambda s: s["stageId"])[-4:]
    for s in recent:
        print(
            json.dumps(
                {
                    "stage": s["stageId"],
                    "name": s["name"][:50],
                    "tasks": s["numCompleteTasks"],
                    "executorRunTime_ms": s["executorRunTime"],
                    "executorCpuTime_ms": round(s["executorCpuTime"] / 1e6, 1),
                    "submission_to_completion_ms": None,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
