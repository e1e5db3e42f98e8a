"""PageRank with damping, dangling-mass redistribution, 1e-6 convergence.

Canonical link-graph kernel required by the north rule (BASELINE.json:14);
not present in the reference (its scope is distance queries) — this is the
standard published algorithm (Brin & Page 1998; dangling handling per the
usual power-iteration formulation):

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u)/outdeg(u) + dangling_mass/N )

converging when ``max|r' - r| <= tol``.

Scale design:
- edges are pre-partitioned by ``src`` once (persisted); each superstep
  re-uses that exchange for the ranks⋈edges join;
- the contribution aggregation is a map-side-partial ``sum`` groupBy —
  power-law in-degree hubs reduce per-partition before the shuffle, and
  AQE skew-join handles residual join skew (session defaults);
- dangling mass is a scalar agg per superstep (no broadcast of vertex-size
  data);
- per-superstep state (id, rank) checkpoints through SuperstepRunner for
  lineage truncation + durable resume.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.supersteps import SuperstepRunner, SuperstepResult


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    runner: Optional[SuperstepRunner] = None,
    name: str = "pagerank",
    resume: bool = False,
    num_partitions: Optional[int] = None,
) -> SuperstepResult:
    """edges: (src BIGINT, dst BIGINT). Returns state (id, rank)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    runner = runner or SuperstepRunner(spark)

    edges = edges.select("src", "dst").distinct()
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
        .persist()
    )
    n = vertices.count()
    out_deg = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("out_deg"))
        .repartition(num_partitions, "id")
        .persist()
    )
    out_deg.count()
    # contribution edges: (src, dst, inv_deg) — join once, reuse every superstep
    cedges = (
        edges.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(num_partitions, "src")
        .persist()
    )
    cedges.count()
    dangling = vertices.join(
        out_deg.select("id"), "id", "left_anti"
    ).persist()
    dangling.count()

    init = vertices.select("id", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, i: int):
        dm_row = state.join(dangling, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()
        dangling_mass = dm_row[0][0]
        contribs = (
            state.join(cedges, state["id"] == cedges["src"])
            .select(
                cedges["dst"].alias("id"),
                (state["rank"] * cedges["inv_deg"]).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        base = (1.0 - damping) / n + damping * dangling_mass / n
        new_state = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .repartition(num_partitions, "id")
            .localCheckpoint(eager=True)
        )
        # max|delta| — joined on the co-partitioned id key; runs against the
        # checkpointed state so the plan is computed exactly once
        delta = (
            new_state.alias("n")
            .join(state.alias("o"), "id")
            .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .collect()[0][0]
        )
        return new_state, {
            "max_delta": delta,
            "dangling_mass": dangling_mass,
            "n": n,
            "_checkpointed": True,
        }

    result = runner.run(
        name,
        init,
        step,
        max_iter=max_iter,
        converged_key="max_delta",
        tol=tol,
        resume=resume,
    )
    for df in (vertices, out_deg, cedges, dangling):
        df.unpersist()
    return result
