#!/usr/bin/env python
"""Probe: where does pagerank_tri's ~0.8 s/iteration go at 750k edges?

Runs the bench-identical pagerank_tri call (warm), reports per-outer-step
wall time (runner metrics) and Spark job-level durations from the UI REST
API - the gap between step wall and in-job time is driver-side overhead
(plan construction, py4j, Observation latency, scheduling idle).

Usage: python BENCH/r06/probe_tri_latency.py
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


def _parse_ui_time(s: str) -> float:
    # format: 2026-08-22T04:10:11.123GMT
    base = time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))
    frac = 0.0
    rest = s[19:]
    if rest.startswith("."):
        digits = "".join(c for c in rest[1:] if c.isdigit())
        if digits:
            frac = float("0." + digits)
    return base + frac


def main():
    from networkx_graph_spark.session import get_spark
    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.kernels.pagerank import pagerank

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="probe-tri", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.ui.enabled": "true"})
    edges = tri_edges(spark, SF_DIR).persist()
    n_edges = edges.count()
    # warmup run (cache build, codegen, JIT)
    pagerank(edges, tol=1e-9, max_iter=60, fuse=2, num_partitions=16)

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    jobs0 = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/jobs"))
    max_job0 = max((j["jobId"] for j in jobs0), default=-1)

    t0 = time.time()
    res = pagerank(edges, tol=1e-9, max_iter=60, fuse=2, num_partitions=16)
    wall = time.time() - t0

    jobs = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/jobs"))
    mine = [j for j in jobs if j["jobId"] > max_job0]
    per_job = []
    for j in sorted(mine, key=lambda x: x["jobId"]):
        st, ct = j.get("submissionTime"), j.get("completionTime")
        if not (st and ct):
            continue
        per_job.append({
            "id": j["jobId"],
            "dur": round(_parse_ui_time(ct) - _parse_ui_time(st), 3),
            "sub": round(_parse_ui_time(st) - t0, 3),
            "desc": (j.get("description") or j.get("name", ""))[:60],
            "stages": len(j.get("stageIds", [])),
        })
    tot_job = sum(j["dur"] for j in per_job)
    # driver gap: wall not covered by any job (approx, jobs may overlap)
    out = {
        "wall": round(wall, 3),
        "n_edges": n_edges,
        "iterations": res.iterations,
        "outer_steps": len(res.metrics),
        "step_wall_sec": [m["wall_sec"] for m in res.metrics],
        "sum_step_wall": round(sum(m["wall_sec"] for m in res.metrics), 3),
        "n_jobs": len(per_job),
        "sum_job_durations": round(tot_job, 3),
        "jobs": per_job,
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
