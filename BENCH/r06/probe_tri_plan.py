#!/usr/bin/env python
"""Dump the executed physical plan of a pagerank_tri outer step (fuse=2)
via the UI REST API, to identify the per-step broadcast jobs."""
from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from networkx_graph_spark.session import get_spark
    from networkx_graph_spark.contract import tri_edges
    from networkx_graph_spark.kernels.pagerank import pagerank

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="probe-tri-plan", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.ui.enabled": "true"})
    edges = tri_edges(spark, SF_DIR).persist()
    edges.count()
    pagerank(edges, tol=0.0, max_iter=4, fuse=2, num_partitions=16)

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    sqls = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/sql?details=true&planDescription=true&length=200"))
    # find the last localCheckpoint execution (an outer step's main action)
    steps = [s for s in sqls if "localCheckpoint" in (s.get("description") or "")]
    tgt = steps[-1]
    print("=== DESCRIPTION:", tgt["description"])
    print("=== DURATION:", tgt.get("duration"))
    plan = tgt.get("planDescription", "")
    print(plan[:12000])
    print("=== NODE SUMMARY ===")
    for ln in plan.splitlines():
        m = re.match(r"\s*[:+\-* ]*(\(?\d+\)?\s*)?(Broadcast\w+|Exchange\w*|Sort(?!MergeJoin)\w*|SortMergeJoin\w*|ShuffledHashJoin|HashAggregate|ObjectHashAggregate|Scan \w+|InMemoryTableScan|ReusedExchange|Subquery\w*|AdaptiveSparkPlan)", ln)
        if m:
            print(ln[:110])
    spark.stop()


if __name__ == "__main__":
    main()
