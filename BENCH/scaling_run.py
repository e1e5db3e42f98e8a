#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule, BASELINE.json:14).

No real multi-executor cluster exists in this sandbox, so the >=0.8
scaling-efficiency criterion is evidenced by running the SAME PageRank
job on the SAME deterministic input at two parallelism levels on this
32-core host: local[8] (N) and local[32] (4N), identical configs
otherwise. Each level runs in its own subprocess (fresh JVM) via
bench.py --subset=pagerank_powerlaw.

Writes BENCH/BASELINE.md with edges/sec/superstep at both levels,
scaling efficiency (T32_throughput / 4) / T8_throughput, and the
determinism check (identical rank checksum at both levels).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--subset=pagerank_powerlaw"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run_level(8)
    r32 = run_level(32)
    tp8 = r8["extra"]["pagerank_edges_per_sec_per_superstep"]
    tp32 = r32["extra"]["pagerank_edges_per_sec_per_superstep"]
    eff = (tp32 / 4.0) / tp8
    deterministic = (
        r8["extra"]["pagerank_rank_sum"] == r32["extra"]["pagerank_rank_sum"]
        and r8["extra"]["pagerank_powerlaw_edges"] == r32["extra"]["pagerank_powerlaw_edges"]
    )
    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Generated {datetime.now(timezone.utc).isoformat()} by BENCH/scaling_run.py.

## Protocol

Same job, same input, two parallelism levels (the sandbox stand-in for
N vs 4N executors — see BASELINE.md "Sandbox evidence plan"):

- job: PageRank, {r8['extra']['pagerank_powerlaw_iters']} fixed supersteps,
  damping 0.85, dangling-mass redistribution, per-superstep
  localCheckpoint (lineage truncation)
- input: deterministic seeded power-law digraph,
  {r8['extra']['pagerank_powerlaw_edges']:,} distinct edges over 1M vertex ids
  (hub-skewed: low ids hold a constant share of endpoints)
- configs identical except master=local[8] vs local[32]
  (AQE on, skew-join on, shuffle partitions = max(cores, 8))

## Results

| level | wall (s) | edges/sec/superstep |
|---|---|---|
| local[8]  (N)  | {r8['queries']['pagerank_powerlaw']:.2f} | {tp8:,.0f} |
| local[32] (4N) | {r32['queries']['pagerank_powerlaw']:.2f} | {tp32:,.0f} |

**Scaling efficiency = (throughput@4N / 4) / throughput@N = {eff:.3f}**
(target >= 0.8, north rule BASELINE.json:14)

Determinism gate: identical rank checksum at both levels: **{deterministic}**
(sum(rank) = {r8['extra']['pagerank_rank_sum']!r})

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(md)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
