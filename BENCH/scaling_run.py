#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule, BASELINE.json:14).

No real multi-executor cluster exists in this sandbox, so the >=0.8
scaling-efficiency criterion is evidenced by running the SAME PageRank
supersteps on the SAME deterministic input at two parallelism levels on
this host: local[8] (N) and local[32] (4N), identical configs otherwise
(fixed shuffle partitions — cores are the only variable).

Methodology for a noisy shared VM (measured wall-clock variance on
identical supersteps exceeds 3x at times): levels run INTERLEAVED
(8, 32, 8, 32), each run executes ITERS supersteps, iteration 0 (codegen
warmup) is dropped, and the per-level throughput is the MEDIAN
edges/sec/superstep pooled across repeats. Min/median/max are reported.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGES = int(os.environ.get("SCALING_EDGES", "16000000"))
VERTICES = int(os.environ.get("SCALING_VERTICES", "2000000"))
ITERS = int(os.environ.get("SCALING_ITERS", "6"))
LEVELS = [8, 32, 8, 32]

PROBE = r"""
import sys, os, json, time
sys.path.insert(0, {repo!r})
os.environ['SPARK_DRIVER_MEMORY'] = '48g'
from networkx_graph_spark.session import get_spark
spark = get_spark(master='local[' + sys.argv[1] + ']', shuffle_partitions=64)
from networkx_graph_spark.sources.datagen import powerlaw_edges
from networkx_graph_spark.kernels.pagerank import pagerank
edges = powerlaw_edges(spark, {vertices}, {edges}).distinct().persist()
n_edges = edges.count()
res = pagerank(edges, tol=0.0, max_iter={iters})
from pyspark.sql import functions as F
checksum = res.state.agg(F.sum('rank')).collect()[0][0]
walls = [m['wall_sec'] for m in res.metrics]
print(json.dumps({{'cpus': int(sys.argv[1]), 'n_edges': n_edges,
                   'walls': walls, 'rank_sum': checksum}}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    script = PROBE.format(repo=REPO, vertices=VERTICES, edges=EDGES, iters=ITERS)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    runs = [run_level(c) for c in LEVELS]
    pooled: dict[int, list[float]] = {}
    sums = {}
    n_edges = runs[0]["n_edges"]
    for r in runs:
        pooled.setdefault(r["cpus"], []).extend(r["walls"][1:])  # drop warmup
        sums[r["cpus"]] = r["rank_sum"]
    stats = {}
    for c, walls in pooled.items():
        tputs = sorted(n_edges / w for w in walls)
        stats[c] = {
            "min": tputs[0],
            "median": statistics.median(tputs),
            "max": tputs[-1],
            "n": len(tputs),
        }
    tp8, tp32 = stats[8]["median"], stats[32]["median"]
    eff = (tp32 / 4.0) / tp8
    det = abs(sums[8] - sums[32])
    rows = "\n".join(
        f"| local[{c}] | {s['n']} | {s['min']:,.0f} | {s['median']:,.0f} | {s['max']:,.0f} |"
        for c, s in sorted(stats.items())
    )
    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Generated {datetime.now(timezone.utc).isoformat()} by BENCH/scaling_run.py.

## Protocol

Same PageRank supersteps, same deterministic input, two parallelism
levels (the sandbox stand-in for N vs 4N executors — BASELINE.md
"Sandbox evidence plan"): local[8] vs local[32], identical configs
otherwise (shuffle partitions pinned to 64, 48g heap, AQE+skew-join on).

- input: seeded power-law digraph, {n_edges:,} distinct edges over
  {VERTICES:,} vertex ids (hub-skewed; partition-invariant generator)
- {ITERS} supersteps per run, iteration 0 (codegen warmup) dropped
- levels interleaved ({LEVELS}) and pooled — this VM is a shared host
  with measured multi-x wall-clock variance on identical work, so the
  per-level throughput is the pooled MEDIAN

## Results (edges/sec/superstep)

| level | supersteps | min | median | max |
|---|---|---|---|---|
{rows}

**Scaling efficiency = (median@4N / 4) / median@N = {eff:.3f}**
(target >= 0.8, north rule BASELINE.json:14)

Determinism: |rank_sum(8) − rank_sum(32)| = {det:.3e}
(identical modulo FP summation order across partition layouts; exact
integer-keyed results — CC labels, SSSP dists/prevs — are bitwise equal
across parallelism, see tests/test_determinism.py)

Raw JSON:

```json
{chr(10).join(json.dumps(r) for r in runs)}
```

## Caveat

This sandbox is a single shared VM: local[8] and local[32] contend for
the same memory bandwidth, page cache and (oversubscribed) physical
cores, so wall-clock scaling here is a lower bound on multi-executor
scaling — on a real cluster N and 4N executors own disjoint resources.
The per-superstep work is embarrassingly partitioned (hash joins +
map-side-partial aggregations over hash-partitioned state), which is the
property the criterion is probing.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
