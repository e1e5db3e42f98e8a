#!/usr/bin/env python
"""Probe: job-level breakdown of the bench cc_powerlaw call (warm), via the
UI REST API — same protocol as probe_tri_latency.py.

Usage: python BENCH/r06/probe_cc_latency.py
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _parse_ui_time(s: str) -> float:
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
    from networkx_graph_spark.kernels.components import connected_components
    from networkx_graph_spark.sources.datagen import powerlaw_edges

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="probe-cc", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.ui.enabled": "true"})
    edges = powerlaw_edges(spark, 1_000_000, 1_000_000).distinct().persist()
    edges.count()
    # warmup
    r = connected_components(edges, algorithm="twophase", max_iter=30)
    r.state.select("component").distinct().count()

    base = "http://localhost:4040/api/v1"
    app_id = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]
    jobs0 = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/jobs"))
    max_job0 = max((j["jobId"] for j in jobs0), default=-1)

    t0 = time.time()
    res = connected_components(edges, algorithm="twophase", max_iter=30)
    n_comp = res.state.select("component").distinct().count()
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
            "stages": len(j.get("stageIds", [])),
        })
    out = {
        "wall": round(wall, 3),
        "iterations": res.iterations,
        "n_comp": n_comp,
        "step_wall_sec": [m["wall_sec"] for m in res.metrics],
        "n_jobs": len(per_job),
        "sum_job_durations": round(sum(j["dur"] for j in per_job), 3),
        "jobs": per_job,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
