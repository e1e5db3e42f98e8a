"""Connected components: hash-min propagation and large-star/small-star.

Canonical kernel (north rule, BASELINE.json:14). Component label = the
minimum vertex id in the (weakly) connected component — identical for both
algorithms, so they cross-check each other.

- ``hash-min``: classic label propagation — each round every vertex takes
  the min label among itself and its (undirected) neighbors. O(diameter)
  rounds; each round one join + one map-side-partial min aggregation.
- ``two-phase``: alternating large-star/small-star rewrites (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  O(log n) rounds on high-diameter graphs; the edge set itself is the
  state and converges to stars rooted at component minima.

Scale: both are pure join+groupBy supersteps over (id-keyed) state, AQE
skew handling on; state checkpoints per superstep via SuperstepRunner.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.supersteps import Materializer, SuperstepRunner, SuperstepResult


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions, self-loops dropped."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _sym_clustered(edges: DataFrame, num_partitions: int) -> DataFrame:
    """``_sym`` + src-clustering in ONE exchange: the dedup runs
    partition-local on top of the src-hash repartition the superstep join
    needs anyway (HashPartitioning(src) satisfies
    ClusteredDistribution([src, dst])) — the former
    ``_sym().repartition()`` shape paid a (src, dst)-hash exchange AND a
    src-hash exchange."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .repartition(num_partitions, "src")
        .dropDuplicates(["src", "dst"])
        # src-sort before the callers cache it: the in-memory scan then
        # reports the ordering and the per-round sort-merge state⋈edges
        # join skips re-sorting the edge side
        .sortWithinPartitions("src")
    )


def connected_components(
    edges: DataFrame,
    algorithm: str = "hashmin",
    max_iter: int = 200,
    runner: Optional[SuperstepRunner] = None,
    name: str = "components",
    resume: bool = False,
    num_partitions: Optional[int] = None,
    exact_convergence: bool = False,
) -> SuperstepResult:
    """edges (src, dst) -> state (id, component), component = min id reachable.

    ``exact_convergence`` (twophase only): use the exact anti-join edge-set
    comparison instead of the default (count, sum(xxhash64)) signature —
    see ``_cc_twophase`` for the trade-off.
    """
    if algorithm == "hashmin":
        return _cc_hashmin(edges, max_iter, runner, name, resume, num_partitions)
    if algorithm == "twophase":
        return _cc_twophase(
            edges, max_iter, runner, name, resume, num_partitions, exact_convergence
        )
    if algorithm == "blocked":
        if runner is not None or resume:
            raise ValueError(
                "algorithm='blocked' does not support runner/resume — its "
                "supersteps run inside bounded_sssp_csr, outside the "
                "SuperstepRunner checkpoint protocol; use hashmin/twophase "
                "for resumable runs"
            )
        return _cc_blocked(edges, max_iter, num_partitions)
    raise ValueError(f"unknown algorithm: {algorithm}")


def _cc_blocked(edges, max_iter, num_partitions, block_width: int = 1024):
    """Block-centric CC through the CSR kernel (operators/sssp_csr.py).

    Hash-min label propagation IS a shortest-path relaxation: seed every
    vertex with ``dist = float(id)``, give every (symmetric) edge weight
    0, and the converged min-"dist" at each vertex is the minimum id
    reachable — its component. The CSR kernel's block-local fixpoint then
    collapses arbitrarily long intra-block chains into one superstep, so
    global rounds ≈ block-boundary crossings instead of graph diameter
    (the high-diameter lever; twophase remains the O(log n) default).
    Float labels are exact: ids are integers < 2^53.
    """
    from ..operators.sssp_csr import NEG_INF, bounded_sssp_csr

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = _sym(edges)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.select(
        F.lit(0).cast("long").alias("qid"),
        F.col("id").alias("node"),
        F.col("id").cast("double").alias("dist"),
        F.col("id").alias("prev"),
        F.lit(NEG_INF).alias("prev_dist"),
    )
    ew = sym.select("src", "dst", F.lit(0.0).alias("weight"))
    state, converged, iters = bounded_sssp_csr(
        spark, ew, seeds, cutoff=float("inf"),
        num_blocks=num_partitions, block_width=block_width, max_iter=max_iter,
        return_info=True,
    )
    if not converged:
        raise RuntimeError(
            f"blocked CC did not reach the fixpoint in max_iter={max_iter} "
            "supersteps — components would be wrong; raise max_iter"
        )
    out = state.select(
        F.col("node").alias("id"), F.col("dist").cast("long").alias("component")
    )
    return SuperstepResult(state=out, iterations=iters, converged=True, metrics=[])


def _cc_hashmin(edges, max_iter, runner, name, resume, num_partitions):
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    runner = runner or SuperstepRunner(spark)
    durable = runner.wants_step_persist()
    if durable and (runner.bucket_cols != ["id"] or runner.bucket_count != num_partitions):
        raise ValueError(
            "durable co-partitioned CC needs bucket_cols=['id'], "
            f"bucket_count={num_partitions}"
        )
    sym = _sym_clustered(edges, num_partitions).persist()
    sym.count()
    mat = Materializer()
    vertices = sym.select(F.col("src").alias("id")).distinct()
    isolated = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .join(vertices, "id", "left_anti")
    )
    init = vertices.select("id", F.col("id").alias("component")).repartition(
        num_partitions, "id"
    )

    def step(state: DataFrame, i: int):
        from pyspark.sql import Observation

        ss = sym.select(F.col("src").alias("_ssrc"), F.col("dst").alias("_sdst"))
        nbr_min = (
            state.join(ss, state["id"] == F.col("_ssrc"))
            .select(F.col("_sdst").alias("id"), state["component"].alias("c"))
            .groupBy("id")
            .agg(F.min("c").alias("nbr_min"))
        )
        new_state = (
            state.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("prev_component"),
            )
            .repartition(num_partitions, "id")
        )
        obs = Observation()
        observed = new_state.observe(
            obs,
            F.coalesce(
                F.sum((F.col("component") != F.col("prev_component")).cast("long")),
                F.lit(0),
            ).alias("changed"),
        ).select("id", "component")
        if durable:
            # bucketed write = the superstep action; the read-back scan
            # keeps hashpartitioning(id), so the next round's state join
            # needs no vertex-state exchange
            new_state = runner.persist_state(observed, name, i)
        else:
            new_state = mat.materialize(observed)
        return new_state, {
            "changed": obs.get["changed"],
            "_checkpointed": True,
            "_durable": durable,
        }

    result = runner.run(
        name, init, step, max_iter=max_iter, converged_key="changed", tol=0, resume=resume
    )
    mat.release()
    sym.unpersist()
    # self-components for isolated vertices (self-loop-only or none)
    result.state = result.state.select("id", "component").unionByName(
        isolated.select("id", F.col("id").alias("component"))
    )
    return result


def _cc_twophase(
    edges, max_iter, runner, name, resume, num_partitions, exact_convergence=False
):
    """Alternating large-star / small-star (Kiveris et al. SoCC'14).

    State = the edge set as parent links (u, v); converges when one
    round of large-star + small-star changes nothing; final state maps
    every vertex to the component minimum.

    Convergence detection is PROBABILISTIC by default: the edge set is
    compared between rounds via an order-insensitive (count,
    sum(xxhash64(u,v))) signature observed on the materialize action
    (1 Spark job per superstep). A 64-bit multiset-hash collision between
    consecutive DIFFERENT edge sets (~2^-64 per round) would declare
    convergence one round early and return wrong components; it also
    burns one extra confirming superstep on an already-converged input.
    ``exact_convergence=True`` restores the exact anti-join set comparison
    (two extra count jobs per superstep) for correctness-gated runs.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    runner = runner or SuperstepRunner(spark)
    if runner.wants_step_persist():
        raise ValueError(
            "two-phase CC state is the EDGE set (u, v), not id-keyed vertex "
            "state — bucketed co-partitioned checkpoints apply to "
            "algorithm='hashmin'; plain durable checkpoints (no bucket_cols) "
            "work with twophase"
        )
    # used exactly once, in the final label join AFTER convergence — keep it
    # lazy (the former eager persist+count paid a full edge pass before the
    # first superstep for a table read once at the end)
    all_vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # one canonical record per undirected pair, built directly with
    # least/greatest (the former _sym().filter(src<dst) shape doubled the
    # rows before deduping); the dedup runs partition-local on top of the
    # u-hash exchange the first round needs anyway (HashPartitioning(u)
    # satisfies ClusteredDistribution([u, v])) — one exchange, not two
    init = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .repartition(num_partitions, "u")
        .dropDuplicates(["u", "v"])
    )

    def _nbrs(state: DataFrame) -> DataFrame:
        return state.select("u", "v").unionByName(
            state.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _nbrs_with_min(state: DataFrame) -> DataFrame:
        # The per-u minimum m = min(Γ(u) ∪ {u}) attached to every
        # symmetrized pair in ONE u-hash exchange + one per-partition
        # sort, via a window. The former aggregate+join shape planned the
        # union TWICE (the groupBy consumer and the join consumer each
        # shuffled their own column-pruned copy — two parallel ~0.5-0.7 s
        # map jobs per star at 1M edges, never merged by exchange reuse)
        # and then paid a sort-merge join to re-attach m.
        from pyspark.sql import Window

        return _nbrs(state).repartition(num_partitions, "u").withColumn(
            "m", F.min(F.least("v", "u")).over(Window.partitionBy("u"))
        )

    # Dedup placement: ONLY small_star (the superstep's final output)
    # canonicalizes the pair set, with a partition-local dropDuplicates ON
    # TOP OF the u-hash repartition the window needs anyway
    # (HashPartitioning(u) satisfies ClusteredDistribution([u, v])).
    # large_star emits its (v, m) pairs RAW — duplicates flow into
    # small_star's per-u window, whose min is multiplicity-insensitive, and
    # die in small_star's trailing dedup. The former shape paid a third
    # exchange + dedup per superstep to canonicalize the intermediate;
    # measured A/B at 1M edges (3 paired rounds, same session): 12.8/11.7/
    # 9.6 s -> 11.5/10.1/9.3 s with assignment-identical output (0 diffs
    # over 1M vertices) and identical iteration count.
    def large_star(state: DataFrame) -> DataFrame:
        # for each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v > u
        return (
            _nbrs_with_min(state)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(state: DataFrame) -> DataFrame:
        # for each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v < u and (u, m)
        nm = _nbrs_with_min(state)
        out = nm.filter(F.col("v") < F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(
            # one (u, m) row per u; the dedup is partition-local on the
            # u-clustered window output (no extra exchange)
            nm.select("u", F.col("m").alias("v")).dropDuplicates(["u"])
        )
        return (
            out.filter(F.col("u") != F.col("v"))
            .repartition(num_partitions, "u")
            .dropDuplicates(["u", "v"])
        )

    mat2 = Materializer()
    # convergence = the edge SET stopped changing. Instead of two anti-join
    # count() jobs per superstep, observe an order-insensitive set signature
    # (count + sum of xxhash64(u, v)) ON the materialize action and compare
    # driver-side — one Spark job per superstep (same trick as PageRank's
    # Observation metrics).
    prev_sig: list = [None]

    def step(state: DataFrame, i: int):
        from pyspark.sql import Observation

        obs = Observation()
        new_state = small_star(large_star(state)).observe(
            obs,
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk"),
        )
        if exact_convergence:
            # keep the old state's blocks alive one extra round: the exact
            # check reads it after the new state is materialized
            new_state = mat2.materialize(new_state, free_prev=False)
            cnt = obs.get["cnt"]
            if prev_sig[0] is not None and prev_sig[0] == cnt:
                # equal cardinality + both sides distinct: new ⊆ old ⇒ equal
                changed = new_state.join(state, ["u", "v"], "left_anti").limit(1).count()
            else:
                changed = 1
            prev_sig[0] = cnt
        else:
            new_state = mat2.materialize(new_state)
            sig = (obs.get["cnt"], obs.get["chk"])
            changed = 0 if sig == prev_sig[0] else 1
            prev_sig[0] = sig
        return new_state, {"changed": changed, "_checkpointed": True}

    result = runner.run(
        name, init, step, max_iter=max_iter, converged_key="changed", tol=0, resume=resume
    )
    # converged state is a forest of depth-1 stars rooted at component
    # minima: one min-aggregation reads the root off for every member
    links = (
        _nbrs(result.state)
        .groupBy("u")
        .agg(F.min(F.least("v", "u")).alias("component"))
        .select(F.col("u").alias("id"), "component")
    )
    result.state = all_vertices.join(links, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
    return result
