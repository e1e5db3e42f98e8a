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
- exactly ONE Spark job per superstep: the convergence delta AND the
  next iteration's dangling mass are ``Observation`` metrics collected as
  a side effect of the checkpoint action (no separate aggregation jobs,
  no broadcast subjob) — the dangling mass enters the following plan as a
  literal;
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

from ..plans.supersteps import Materializer, SuperstepRunner, SuperstepResult


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

    mat = Materializer()
    n_dangling = vertices.join(out_deg, "id", "left_anti").count()
    # dm of the uniform init state; afterwards maintained via observations;
    # None forces a recompute from loaded state (resume path)
    dm_holder = {"dm": None if resume else (n_dangling / n if n else 0.0)}

    def step(state: DataFrame, i: int):
        from pyspark.sql import Observation

        dm = dm_holder["dm"]
        if dm is None:
            # resume path: recompute the dangling mass from the loaded state
            dm = (
                state.filter(F.col("dangling"))
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
        # rename the edge side: persisted state keeps lineage back to
        # cedges, so dataframe[col] references would be ambiguous
        ce = cedges.select(
            F.col("src").alias("_csrc"),
            F.col("dst").alias("_cdst"),
            F.col("inv_deg").alias("_cinv"),
        )
        contribs = (
            state.join(ce, state["id"] == F.col("_csrc"))
            .select(
                F.col("_cdst").alias("id"),
                (state["rank"] * F.col("_cinv")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        new_state = (
            state.select("id", F.col("rank").alias("prev_rank"), "dangling")
            .join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.lit(dm / n) + F.coalesce(F.col("c"), F.lit(0.0)))
                ).alias("rank"),
                "prev_rank",
                "dangling",
            )
            .repartition(num_partitions, "id")
        )
        obs = Observation()  # auto-named; unique per superstep
        new_state = mat.materialize(
            new_state.observe(
                obs,
                F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
                ).alias("dm"),
            )
        )
        vals = obs.get
        dm_holder["dm"] = vals["dm"]
        return new_state, {
            "max_delta": vals["delta"],
            "dangling_mass": vals["dm"],
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
    result.state = result.state.select("id", "rank")
    mat.release()
    for df in (vertices, cedges):
        df.unpersist()
    return result
