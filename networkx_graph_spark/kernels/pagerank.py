"""PageRank with damping, dangling-mass redistribution, 1e-6 convergence.

Canonical link-graph kernel required by the north rule (BASELINE.json:14);
not present in the reference (its scope is distance queries) — this is the
standard published algorithm (Brin & Page 1998; dangling handling per the
usual power-iteration formulation):

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u)/outdeg(u) + dangling_mass/N )

converging when ``max|r' - r| <= tol``.

Scale design (per-superstep job count matters as much as shuffle volume):

- contribution edges ``(src, dst, inv_deg)`` are joined once and
  pre-partitioned by ``src`` (persisted) — every superstep's ranks⋈edges
  join reuses that exchange;
- the dangling-mass scalar is a 1-row aggregate CROSS-JOINED into the
  plan (broadcast), not collected — no extra driver round-trip;
- the state carries ``prev_rank`` so the convergence metric is a single
  co-partition-free scan-aggregate over the checkpointed state: exactly
  TWO jobs per superstep (materialize + delta), no 1M x 1M delta join;
- the contribution aggregation is map-side-partial ``sum`` — power-law
  in-degree hubs reduce per-partition before the shuffle; AQE skew-join
  handles residual join skew (session defaults);
- state checkpoints via SuperstepRunner (lineage truncation + durable
  parquet resume, north rule).
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
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    # contribution edges: join once, reuse the src-hash exchange every superstep
    cedges = (
        edges.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(num_partitions, "src")
        .persist()
    )
    cedges.count()

    init = (
        vertices.join(out_deg, "id", "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.lit(0.0).alias("prev_rank"),
            F.col("out_deg").isNull().alias("dangling"),
        )
        .repartition(num_partitions, "id")
    )

    def step(state: DataFrame, i: int):
        # 1-row dangling-mass aggregate, broadcast into the plan (no collect)
        dm_df = state.filter(F.col("dangling")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            state.join(cedges, state["id"] == cedges["src"])
            .select(
                cedges["dst"].alias("id"),
                (state["rank"] * cedges["inv_deg"]).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        new_state = (
            state.select("id", F.col("rank").alias("prev_rank"), "dangling")
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(dm_df))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.col("_dm") / n + F.coalesce(F.col("c"), F.lit(0.0)))
                ).alias("rank"),
                "prev_rank",
                "dangling",
            )
            .repartition(num_partitions, "id")
            .localCheckpoint(eager=True)
        )
        # convergence metric: single scan over the checkpointed state
        delta = new_state.agg(F.max(F.abs(F.col("rank") - F.col("prev_rank")))).collect()[
            0
        ][0]
        return new_state, {"max_delta": delta, "n": n, "_checkpointed": True}

    result = runner.run(
        name,
        init,
        step,
        max_iter=max_iter,
        converged_key="max_delta",
        tol=tol,
        resume=resume,
    )
    result.state = result.state.select("id", "rank")
    for df in (vertices, cedges):
        df.unpersist()
    return result
