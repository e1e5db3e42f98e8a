"""CSR-blocked per-partition relaxation: superstep-count reduction.

North-star architecture item (BASELINE.json:6): "iterative kernels
operate on CSR-blocked adjacency partitions". The plain kernel
(operators/sssp.py) advances one hop per superstep; on high-diameter
graphs the superstep count — not per-superstep cost — dominates.

This variant co-partitions the frontier with the edge blocks by
``(node // block_width) % P`` and, inside each partition, runs a LOCAL
label-correcting fixpoint over that block's adjacency held as CSR numpy
arrays (built per batch from the Arrow columns — no Python-object graph).
Edges whose destination lands in the same block relax immediately;
cross-block improvements exit as messages for the global min-merge. One
global superstep therefore advances through arbitrarily long intra-block
chains ("block-centric" iteration, cf. Giraph++/Blogel), cutting global
rounds toward the number of block-boundary crossings on the shortest
path.

Semantics: identical fixpoint and the SAME deterministic tie-break
struct ``(dist, prev_dist, prev)`` as ``bounded_sssp`` — the local loop
applies lexicographic-min updates, and the global merge is unchanged, so
dists AND prevs match the plain kernel exactly (tested).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NEG_INF = float("-inf")


def _local_relax_factory(num_blocks: int, cutoff: float, block_width: int = 1):
    """Cogrouped-map fn: (frontier block, edge block) -> improved states
    reached through any number of intra-block hops."""

    def fn(frontier: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if frontier.empty or edges.empty:
            return frontier[["qid", "node", "dist", "prev", "prev_dist"]]
        esrc = edges["src"].to_numpy()
        edst = edges["dst"].to_numpy()
        ew = edges["weight"].to_numpy()
        order = np.argsort(esrc, kind="stable")
        esrc, edst, ew = esrc[order], edst[order], ew[order]
        # CSR over the block's source vertices
        uniq, starts = np.unique(esrc, return_index=True)
        starts = np.append(starts, len(esrc))
        src_pos = {int(s): (int(starts[i]), int(starts[i + 1])) for i, s in enumerate(uniq)}

        out: dict[tuple[int, int], tuple[float, float, int]] = {}
        work = [
            (int(q), int(n), float(d), float(pd_), int(p))
            for q, n, d, p, pd_ in zip(
                frontier["qid"], frontier["node"], frontier["dist"],
                frontier["prev"], frontier["prev_dist"],
            )
        ]
        # seed the local best map with the incoming frontier states so
        # intra-block improvements compare against them
        best: dict[tuple[int, int], tuple[float, float, int]] = {}
        for q, n, d, pd_, p in work:
            k = (q, n)
            cand = (d, pd_, p)
            if k not in best or cand < best[k]:
                best[k] = cand
        stack = list(best.keys())
        while stack:
            q, u = stack.pop()
            du = best[(q, u)][0]
            rng = src_pos.get(u)
            if rng is None:
                continue
            for i in range(rng[0], rng[1]):
                v = int(edst[i])
                c = du + float(ew[i])
                if c > cutoff:
                    continue
                k = (q, v)
                cand = (c, du, u)
                if k not in best or cand < best[k]:
                    best[k] = cand
                    out[k] = cand
                    # only same-block destinations can relax further locally
                    if (v // block_width) % num_blocks == (u // block_width) % num_blocks:
                        stack.append(k)

        # emit only states set/improved by local relaxation (the incoming
        # frontier is already in the global state)
        rows = [(q, n, d, p, pd_) for (q, n), (d, pd_, p) in out.items()]
        return pd.DataFrame(
            rows, columns=["qid", "node", "dist", "prev", "prev_dist"]
        )

    return fn


def bounded_sssp_csr(
    spark: SparkSession,
    edges_w: DataFrame,
    seeds: DataFrame,
    cutoff: float,
    num_blocks: Optional[int] = None,
    block_width: int = 1,
    max_iter: int = 10_000,
) -> DataFrame:
    """Block-centric variant of ``bounded_sssp`` (scalar cutoff, no sinks;
    the plain kernel covers the full parameter surface). Returns the same
    converged state (qid, node, dist, prev, prev_dist).

    ``block_width``: ids are blocked by ``(id // block_width) % num_blocks``
    — width 1 is a round-robin (hash-like) blocking; a larger width gives
    RANGE blocking, which is what makes block-centric iteration pay off on
    graphs whose id assignment preserves locality (crawl-order url ids,
    dictionary-encoded host-sorted ids): intra-block chains collapse into
    one superstep."""
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions"))
    blk = lambda c: F.pmod(F.floor(F.col(c) / F.lit(block_width)), F.lit(num_blocks))  # noqa: E731
    eb = edges_w.withColumn("_blk", blk("src"))
    fn = _local_relax_factory(num_blocks, float(cutoff), block_width)
    schema = "qid long, node long, dist double, prev long, prev_dist double"

    state = seeds.localCheckpoint(eager=True)
    frontier = state
    for _ in range(max_iter):
        msgs = (
            frontier.withColumn("_blk", blk("node"))
            .groupBy("_blk")
            .cogroup(eb.groupBy("_blk"))
            .applyInPandas(fn, schema=schema)
        )
        best = (
            msgs.groupBy("qid", "node")
            .agg(F.min(F.struct("dist", "prev_dist", "prev")).alias("m"))
            .select("qid", "node", "m.dist", "m.prev_dist", "m.prev")
        )
        old = state.select(
            "qid", "node", F.struct("dist", "prev_dist", "prev").alias("_old")
        )
        improved = (
            best.join(old, ["qid", "node"], "left")
            .filter(
                F.col("_old").isNull()
                | (F.struct("dist", "prev_dist", "prev") < F.col("_old"))
            )
            .select("qid", "node", "dist", "prev", "prev_dist")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        state = (
            state.join(improved.select("qid", "node"), ["qid", "node"], "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return state
