"""Bounded multi-source shortest-path kernel + the reference query surface.

The reference kernel is a sequential Fibonacci-heap Dijkstra
(/root/reference/src/main.cpp:1101-1165). Heap ordering is a sequential
optimization only — a label-correcting (Bellman-Ford-style) frontier
iteration converges to the *identical* distance map, so the Spark-native
kernel is a superstep loop of

    frontier ⋈ edges_w  →  min-merge into state  →  new frontier

over a state DataFrame ``(qid, node, dist, prev, prev_dist)``. ``qid``
makes the kernel *multi-query from the start*: a batch of point/SSSP
queries (or the UBODT build, which seeds every vertex) advances in one
Spark job instead of |Q| sequential Dijkstras — this is where the Spark
design beats the reference's (stubbed) parallelism
(/root/reference/src/main.cpp:990-994).

Exact-match semantics replicated:

- cost model: relaxing out of ``u`` adds ``length(u)`` — interior nodes
  only; successors of the start are seeded at ``init_offset``
  (/root/reference/src/main.cpp:1118-1126, :1141-1143);
- cutoff: new nodes only admitted when ``dist <= cutoff``
  (/root/reference/src/main.cpp:1156); *seeds are exempt* (inserted
  unconditionally, /root/reference/src/main.cpp:1186-1190);
- sinks: you may arrive at a sink but never relax out of it
  (/root/reference/src/main.cpp:1120, :1134-1135);
- tie-break: Dijkstra keeps the first setter under heap order
  (value-then-index, /root/reference/src/heap.hpp:551-561), i.e. the
  predecessor minimizing ``(dist(prev), prev)`` among minimal-dist ones.
  We reproduce it deterministically with a lexicographic min over the
  struct ``(dist, prev_dist, prev)``; seeds carry ``prev_dist = -inf`` so
  they win ties like Dijkstra's pre-loop insertion.

Scale notes: state and frontier are hash-partitioned on the join key;
``edges_w`` is pre-partitioned by ``src`` (graph build) so the per-superstep
join reuses its exchange; every superstep ``localCheckpoint``s to truncate
lineage; queries/sinks are broadcast (they are small per-batch dimension
tables). Skewed hub vertices are handled by AQE skew-join splitting
(enabled in session.py) — the min-merge aggregation is already map-side
partial.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..graph import SparkDiGraph
from ..rounding import clip, round_half_up

NEG_INF = float("-inf")

STATE_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("node", T.LongType(), False),
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("prev", T.LongType(), False),
        T.StructField("prev_dist", T.DoubleType(), False),
    ]
)


def bounded_sssp(
    spark: SparkSession,
    edges_w: DataFrame,
    seeds: DataFrame,
    cutoffs: DataFrame,
    sinks: Optional[DataFrame] = None,
    max_iter: int = 10_000,
    payload_cols: Sequence[str] = (),
    targets: Optional[DataFrame] = None,
    runner=None,
    name: str = "sssp",
    resume: bool = False,
) -> DataFrame:
    """Run the label-correcting relaxation to fixpoint.

    Parameters
    ----------
    edges_w : (src, dst, weight) — weight = length of the node relaxed out of
    seeds   : (qid, node, dist, prev, prev_dist [, payload...]) — cutoff-exempt
    cutoffs : (qid, cutoff) — admission bound per query (broadcast)
    sinks   : (qid, node) or None — arrive-only barrier nodes (broadcast)
    payload_cols : extra seed columns carried along winning paths (e.g. the
        UBODT ``first_hop``); they ride behind the tie-break key.
    targets : (qid, node) or None — p2p early termination
        (/root/reference/src/main.cpp:1198-1200 stops when the target pops).
        Once a query's target holds dist ``t``, frontier rows of that query
        with ``dist > t`` are pruned: weights are non-negative, so they can
        only produce labels ≥ their own dist — never a better target label,
        and never a better label on the winning chain (whose prefixes all
        sit strictly below ``t``). Rows at exactly ``t`` keep expanding so
        the lexicographic (dist, prev_dist, prev) tie-break is unaffected.
        Only the target's chain is guaranteed final — p2p callers only.

    Returns the converged state (qid, node, dist, prev, prev_dist [, payload]).

    Job budget: exactly ONE Spark job per superstep. The state carries a
    ``_new`` frontier flag; the improved-row count (emptiness/convergence)
    and the per-query target hits (p2p early termination) are
    ``Observation`` metrics collected as side effects of the single state
    checkpoint action — no separate ``isEmpty``/frontier checkpoint/target
    ``collect`` jobs (the same 1-job/superstep pattern as the PageRank and
    CC kernels).

    Durability (north rule): pass a ``SuperstepRunner`` with a
    ``checkpoint_dir`` (optionally ``bucket_cols=["qid", "node"]`` for
    co-partitioned bucketed checkpoints) plus ``name``/``resume`` to make
    long fixpoints — the UBODT build seeds EVERY vertex — resumable
    mid-iteration with per-superstep metrics/lineage; ``tbest`` for p2p
    early termination is recomputed from the loaded state on resume.
    """
    from pyspark.sql import Observation

    from ..plans.supersteps import Materializer, SuperstepRunner, _free_checkpoint

    pl = list(payload_cols)
    # the hoisted name-resolved message projection below requires payload
    # names disjoint from the edge columns (they always were in spirit —
    # the seeds schema is (qid, node, dist, prev, prev_dist, payload...))
    _reserved = {"src", "dst", "weight", "cutoff"}
    if _reserved & set(pl):
        raise ValueError(f"payload_cols may not use reserved names {_reserved}")
    key = ["dist", "prev_dist", "prev", *pl]
    cols = ["qid", "node", "dist", "prev", "prev_dist", *pl]
    runner = runner or SuperstepRunner(spark)
    durable = runner.wants_step_persist()
    if durable and runner.bucket_cols != ["qid", "node"]:
        raise ValueError(
            "durable co-partitioned SSSP needs bucket_cols=['qid', 'node'] "
            f"(got {runner.bucket_cols})"
        )
    mat = Materializer()
    tbest: dict[int, float] = {}
    tb_seeded = {"done": False}
    tmark = None
    if targets is not None:
        tmark = F.broadcast(
            targets.select("qid", "node").withColumn("_is_tgt", F.lit(True))
        )
    init = seeds.select(*cols).withColumn("_new", F.lit(True))

    # Loop-invariant plan fragments, built once (same driver-latency lever
    # as the PageRank kernel: Column expressions are immutable and resolve
    # by name, so rebuilding them per superstep only pays py4j/Catalyst
    # construction time again). Names are unambiguous in every join below
    # (state: qid/node/dist/prev/prev_dist/payload; edges: src/dst/weight).
    _fsel_cols = ("qid", "node", "dist", *pl)
    _msg_jcond = F.col("node") == F.col("src")
    _msg_proj = (
        F.col("qid"),
        F.col("dst").alias("node"),
        (F.col("dist") + F.col("weight")).alias("dist"),
        F.col("src").alias("prev"),
        F.col("dist").alias("prev_dist"),
        *[F.col(c) for c in pl],
    )
    if isinstance(cutoffs, (int, float)):
        _cut_filter = F.col("dist") <= F.lit(float(cutoffs))
        _cut_bcast = None
    else:
        _cut_filter = F.col("dist") <= F.col("cutoff")
        _cut_bcast = F.broadcast(cutoffs)
    _cand_agg = F.min(F.struct(*key)).alias("_cand")
    _old_proj = ("qid", "node", F.struct(*key).alias("_old"))
    _better = F.col("_cand").isNotNull() & (
        F.col("_old").isNull() | (F.col("_cand") < F.col("_old"))
    )
    _merge = F.when(_better, F.col("_cand")).otherwise(F.col("_old"))
    _state_proj = (
        "qid",
        "node",
        *[F.col(f"_m.{c}").alias(c) for c in key],
        "_new",
    )
    _cnt_metric = F.coalesce(F.sum(F.col("_new").cast("long")), F.lit(0)).alias("cnt")
    _hits_metric = F.collect_list(
        F.when(F.col("_is_tgt") & F.col("_new"), F.struct("qid", "dist"))
    ).alias("hits")

    def step(state: DataFrame, i: int):
        if targets is not None and not tb_seeded["done"]:
            # first step (fresh or resumed): seed tbest from current state
            for r in state.join(F.broadcast(targets), ["qid", "node"]).groupBy(
                "qid"
            ).agg(F.min("dist").alias("d")).collect():
                tbest[r["qid"]] = r["d"]
            tb_seeded["done"] = True
        frontier = state.filter(F.col("_new")).select(*cols)
        if targets is not None and tbest and i > 0:
            # prune frontier rows strictly above their query's best target
            # distance (reference first-pop semantics, see docstring); the
            # seed frontier (i == 0) is never pruned (parity with pre-loop
            # insertion)
            tb = spark.createDataFrame(list(tbest.items()), "qid long, _tbest double")
            frontier = frontier.join(F.broadcast(tb), "qid", "left").filter(
                F.col("_tbest").isNull() | (F.col("dist") <= F.col("_tbest"))
            ).drop("_tbest")
        f = frontier
        if sinks is not None:
            f = f.join(F.broadcast(sinks), ["qid", "node"], "left_anti")
        msgs = f.select(*_fsel_cols).join(edges_w, _msg_jcond).select(*_msg_proj)
        if _cut_bcast is None:
            msgs = msgs.filter(_cut_filter)
        else:
            msgs = msgs.join(_cut_bcast, "qid").filter(_cut_filter).drop("cutoff")
        # Single full-outer merge of old state vs candidate minima: the
        # previous shape (left-join to find improvements, anti-join to
        # drop replaced rows, union back) walked the state three times
        # with two (qid, node) joins per superstep; one full-outer join
        # computes the identical row set — kept rows where the old
        # tie-break struct wins or no candidate exists (_new false),
        # updated/new rows where the candidate struct strictly wins
        # (_new true).
        best = msgs.groupBy("qid", "node").agg(_cand_agg)
        new_state = (
            state.select(*_old_proj)
            .join(best, ["qid", "node"], "full")
            .withColumn("_m", _merge)
            .withColumn("_new", _better)
            .select(*_state_proj)
        )
        obs = Observation()
        metric_exprs = [_cnt_metric]
        if targets is not None:
            new_state = new_state.join(tmark, ["qid", "node"], "left")
            metric_exprs.append(_hits_metric)
        observed = new_state.observe(obs, *metric_exprs).select(*cols, "_new")
        if durable:
            # bucketed write = the superstep action (metrics ride it; the
            # read-back keeps hashpartitioning(qid, node)); pre-cluster on
            # the bucket cols per persist_state's contract so each task
            # writes exactly one bucket file (not tasks x buckets smalls)
            observed = observed.repartition(
                runner.bucket_count, *runner.bucket_cols
            )
            out_state = runner.persist_state(observed, name, i)
        else:
            out_state = mat.materialize(observed)
        if i == 0:
            # the runner's init checkpoint isn't Materializer-tracked;
            # free it now that the first round's state is self-contained
            # (no-op for a parquet-resumed state)
            _free_checkpoint(state)
        got = obs.get
        if targets is not None:
            for h in got["hits"]:
                q, d = h["qid"], h["dist"]
                if q not in tbest or d < tbest[q]:
                    tbest[q] = d
        return out_state, {"cnt": got["cnt"], "_checkpointed": True, "_durable": durable}

    result = runner.run(
        name, init, step, max_iter=max_iter, converged_key="cnt", tol=0, resume=resume
    )
    out = result.state.select(*cols)
    mat.release()
    return out


def backtrace(
    state: DataFrame,
    ends: DataFrame,
    sources: DataFrame,
    max_iter: int = 10_000,
) -> DataFrame:
    """Reconstruct node chains by walking the predecessor map.

    state   : (qid, node, prev, ...) — converged SSSP state
    ends    : (qid, node) — nodes to trace back from
    sources : (qid, start) — per-query termination node

    Returns (qid, node, chain ARRAY<BIGINT>) where chain = [end, ..., start]
    (prev-order; callers reverse for forward paths). Iterative join — the
    loop count is the longest chain, bounded by the cutoff.
    """
    from pyspark.sql import Observation

    from ..plans.supersteps import Materializer

    def _pending_obs(df):
        obs = Observation()
        return obs, df.observe(
            obs,
            F.coalesce(F.sum((~F.col("done")).cast("long")), F.lit(0)).alias("pending"),
        )

    pmap = state.select("qid", F.col("node").alias("_pn"), F.col("prev").alias("_pp"))
    mat = Materializer()
    obs, observed = _pending_obs(
        ends.join(F.broadcast(sources), "qid")
        .select(
            "qid",
            "node",
            F.array("node").alias("chain"),
            F.col("node").alias("head"),
            "start",
        )
        .withColumn("done", F.col("head") == F.col("start"))
    )
    cur = mat.materialize(observed)
    # one action per round: the pending count rides each checkpoint
    for _ in range(max_iter):
        if obs.get["pending"] == 0:
            break
        todo = cur.filter(~F.col("done"))
        done_rows = cur.filter(F.col("done"))
        stepped = (
            todo.join(
                pmap,
                (todo["qid"] == pmap["qid"]) & (todo["head"] == pmap["_pn"]),
                "left",
            )
            .select(
                todo["qid"],
                todo["node"],
                F.when(
                    pmap["_pp"].isNotNull(),
                    F.concat(todo["chain"], F.array(pmap["_pp"])),
                )
                .otherwise(todo["chain"])
                .alias("chain"),
                F.coalesce(pmap["_pp"], todo["head"]).alias("head"),
                todo["start"],
                pmap["_pp"].isNull().alias("_miss"),
            )
            .withColumn(
                "done",
                F.col("_miss") | (F.col("head") == F.col("start")),
            )
            .drop("_miss")
        )
        obs, observed = _pending_obs(done_rows.unionByName(stepped))
        cur = mat.materialize(observed)
    out = cur.select("qid", "node", "chain")
    mat.release()
    return out


# --------------------------------------------------------------------------
# Reference query surface (single-query convenience over the batch kernel)
# --------------------------------------------------------------------------


@dataclass
class PathResult:
    """Mirror of the reference ``Path`` (/root/reference/src/main.cpp:181-209)."""

    dist: float
    nodes: list[str]
    start_offset: Optional[float] = None
    end_offset: Optional[float] = None
    binding: Optional[tuple] = None
    directions: Optional[list[int]] = None  # zigzag only
    graph: Optional["SparkDiGraph"] = field(default=None, repr=False, compare=False)

    _FIELDS = (
        "dist", "nodes", "start_offset", "end_offset", "binding",
        "directions", "graph",
    )
    # readonly keys per the reference __setitem__ guard
    # (/root/reference/src/main.cpp:2513-2523)
    _RESERVED = ("graph", "dist", "nodes", "_signature", "start", "end", "binding")

    @property
    def _signature(self) -> tuple:
        """(internal node indexes, start_offset, end_offset) — the
        reference Path._signature (/root/reference/src/main.cpp:2437-2443)
        exposes the Indexer's int64 ids, not the string names."""
        if self.graph is None:
            raise RuntimeError(
                "PathResult has no graph attached (_signature needs the "
                "Indexer to map names back to internal ids)"
            )
        return (
            tuple(self.graph.node_id(n) for n in self.nodes),
            self.start_offset,
            self.end_offset,
        )

    def with_graph(self, graph) -> "PathResult":
        self.graph = graph
        return self

    def __getitem__(self, key: str):
        """Attr-by-name access (/root/reference/src/main.cpp:2474-2510);
        unknown keys raise KeyError like the reference's py::key_error."""
        if key == "dist":
            return self.dist
        if key == "nodes":
            return list(self.nodes)
        if key == "_signature":
            return self._signature
        if key == "start":
            return (self.nodes[0], self.start_offset)
        if key == "end":
            return (self.nodes[-1], self.end_offset)
        if key == "binding":
            return self.binding
        if key == "graph":
            # reference fallthrough: ``Path.graph`` is a readonly property,
            # so py::hasattr finds it (/root/reference/src/main.cpp:2503-2509)
            return self.graph
        if key in self.__dict__ and key not in self._FIELDS:
            return self.__dict__[key]
        if (
            not key.startswith("_")
            and key not in self._FIELDS
            and hasattr(type(self), key)
        ):
            # same hasattr fallthrough for public methods (e.g. 'to_dict');
            # start/end offsets stay hidden — the reference Path exposes no
            # such attributes (_FIELDS exclusion)
            return getattr(self, key)
        raise KeyError(f"attribute:{key} not found")

    def __setitem__(self, key: str, value):
        if key in self._RESERVED:
            raise KeyError(f"{key} is readonly")
        setattr(self, key, value)
        return value

    def to_dict(self) -> dict:
        d = {
            "dist": self.dist,
            "nodes": list(self.nodes),
            "start": (self.nodes[0], self.start_offset),
            "end": (self.nodes[-1], self.end_offset),
        }
        if self.binding is not None:
            d["binding"] = self.binding
        if self.directions is not None:
            d["directions"] = list(self.directions)
        # dynamic attrs (reference py::dynamic_attr parity,
        # /root/reference/tests/test_basic.py:1291-1292)
        for k, v in self.__dict__.items():
            if k not in self._FIELDS and not k.startswith("_"):
                d[k] = v
        return d

    def round(self, scale: Optional[float]) -> "PathResult":
        if scale is not None:
            self.dist = round_half_up(self.dist, scale)
            if self.start_offset is not None:
                self.start_offset = round_half_up(self.start_offset, scale)
            if self.end_offset is not None:
                self.end_offset = round_half_up(self.end_offset, scale)
        return self


@dataclass
class ShortestPathGen:
    """Spark-side mirror of ``ShortestPathGenerator``
    (/root/reference/src/main.cpp:2843-3061): the converged SSSP state is
    the generator's (prevs, dists) 'IR'; destinations/paths/path are cheap
    derived queries over it."""

    graph: SparkDiGraph
    state: Optional[DataFrame]  # converged (qid=0) state; None if not ready
    cutoff: float = 0.0
    source: Optional[tuple[str, Optional[float]]] = None  # (node, raw offset)
    target: Optional[tuple[str, Optional[float]]] = None
    start_id: Optional[int] = None
    _rows: Optional[list] = field(default=None, repr=False)

    def _collect(self):
        if self._rows is None:
            self._rows = [] if self.state is None else self.state.collect()
        return self._rows

    def dists_df(self) -> DataFrame:
        """(node BIGINT, dist DOUBLE) excluding the start (the reference
        erases it, /root/reference/src/main.cpp:1164)."""
        if self.state is None:
            return self.graph.spark.createDataFrame(
                [], "node long, dist double"
            )
        return self.state.filter(F.col("node") != self.start_id).select("node", "dist")

    def prevs_df(self) -> DataFrame:
        if self.state is None:
            return self.graph.spark.createDataFrame([], "node long, prev long")
        return self.state.select("node", "prev")

    def dists(self) -> dict[str, float]:
        nm = self.graph.names_map
        return {
            nm[r["node"]]: r["dist"]
            for r in self._collect()
            if r["node"] != self.start_id
        }

    def prevs(self) -> dict[str, str]:
        nm = self.graph.names_map
        return {nm[r["node"]]: nm[r["prev"]] for r in self._collect()}

    def destinations(self) -> list[tuple[float, str]]:
        """Sorted (dist, node) — tuple sort, so ties break on the node
        string (/root/reference/src/main.cpp:2912-2928). No rounding (the
        reference returns raw dmap values here)."""
        return sorted((d, n) for n, d in self.dists().items())

    def to_dict(self) -> dict:
        """Generator summary (/root/reference/tests/test_basic.py:681,
        :698, :834): {'cutoff': ..., 'source'|'target': (node, offset)}."""
        d: dict = {"cutoff": self.cutoff}
        if self.source is not None:
            d["source"] = self.source
        if self.target is not None:
            d["target"] = self.target
        return d

    def source_info(self):
        """source() accessor (/root/reference/src/main.cpp:2882-2896)."""
        return self.source

    def target_info(self):
        return self.target

    def _single_node_path(self) -> list[PathResult]:
        """Empty-prevs special case (/root/reference/src/main.cpp:2938-2976)."""
        scale = self.graph.scale
        if self.source is not None and self.source[1] is not None:
            node, off = self.source
            length = self.graph.lengths_map[self.start_id]
            so = clip(0.0, off, length)
            eo = clip(0.0, so + self.cutoff, length)
            if so < eo:
                return [PathResult(eo - so, [node], so, eo).round(scale).with_graph(self.graph)]
        elif self.target is not None and self.target[1] is not None:
            node, off = self.target
            length = self.graph.lengths_map[self.start_id]
            eo = clip(0.0, off, length)
            so = clip(0.0, eo - self.cutoff, length)
            if so < eo:
                return [PathResult(eo - so, [node], so, eo).round(scale).with_graph(self.graph)]
        return []

    def _decorate(self, end_id: int, chain_ids: list[int]) -> PathResult:
        """Shared path decoration (/root/reference/src/main.cpp:2989-3012)."""
        lm, nm = self.graph.lengths_map, self.graph.names_map
        rows = {r["node"]: r for r in self._collect()}
        dist = rows[end_id]["dist"]
        length = lm[end_id]
        p_dist = min(self.cutoff, dist + length)
        if self.source is not None:
            nodes = list(reversed(chain_ids))
            so = self.source[1]
            eo = clip(0.0, self.cutoff - dist, length)
        else:
            nodes = chain_ids  # [end .. target], forward order toward target
            so = clip(0.0, length - (self.cutoff - dist), length)
            eo = self.target[1]
        return PathResult(
            p_dist, [nm[i] for i in nodes], so, eo
        ).round(self.graph.scale).with_graph(self.graph)

    def paths(self) -> list[PathResult]:
        """All leaf paths, each extended to the cutoff
        (/root/reference/src/main.cpp:2930-3018). Sorted by dist
        descending; ties canonicalized by node list (the reference's tie
        order is unordered_set iteration order — unspecified)."""
        rows = self._collect()
        if not rows:
            return self._single_node_path()
        prev_of = {r["node"]: r["prev"] for r in rows}
        non_leaves = set(prev_of.values())
        ends = [n for n in prev_of if n not in non_leaves]
        out = []
        for end in ends:
            chain = [end]
            cur = end
            while cur != self.start_id:
                cur = prev_of[cur]
                chain.append(cur)
            out.append(self._decorate(end, chain))
        out.sort(key=lambda p: (-p.dist, p.nodes))
        return out

    def path(self, node: str) -> Optional[PathResult]:
        """Single backtrace (/root/reference/src/main.cpp:3022-3060)."""
        nid = self.graph.node_id(node)
        rows = self._collect()
        prev_of = {r["node"]: r["prev"] for r in rows}
        if nid is None or nid not in prev_of:
            return None
        chain = [nid]
        cur = nid
        while cur != self.start_id:
            cur = prev_of[cur]
            chain.append(cur)
        return self._decorate(nid, chain)


def _encode_sinks_df(
    graph: SparkDiGraph, sinks: Optional[Sequence[str]], qid: int = 0
) -> Optional[DataFrame]:
    if not sinks:
        return None
    ids = [graph.node_id(s) for s in sinks]
    rows = [(qid, i) for i in ids if i is not None]
    return graph.spark.createDataFrame(rows or [], "qid long, node long")


def shortest_paths(
    graph: SparkDiGraph,
    start: str,
    cutoff: float,
    offset: Optional[float] = None,
    reverse: bool = False,
    sinks: Optional[Sequence[str]] = None,
) -> ShortestPathGen:
    """SSSP-tree generator — ``shortest_paths_from``/``_to``
    (/root/reference/src/main.cpp:655-693)."""
    gen = ShortestPathGen(
        graph,
        None,
        cutoff=cutoff,
        source=None if reverse else (start, offset),
        target=(start, offset) if reverse else None,
    )
    if cutoff < 0:
        return ShortestPathGen(graph, None)  # not ready at all
    sid = graph.node_id(start)
    # targeted single-vertex lookup — building the full |V|-row driver map
    # here cost a count + toPandas per fresh-graph call (the maps still
    # build lazily for the decoration accessors that genuinely need them)
    length = graph.vertex_length(sid)
    if sid is None or length is None:
        return ShortestPathGen(graph, None)
    gen.start_id = sid
    init_offset = 0.0
    if offset is not None:
        o = clip(0.0, offset, length)
        init_offset = o if reverse else length - o
    if cutoff < init_offset:
        return gen  # kernel skipped (/root/reference/src/main.cpp:1111-1113)
    edges_w = graph.edges_w_rev if reverse else graph.edges_w
    sink_ids = {graph.node_id(s) for s in sinks} if sinks else set()
    if sid in sink_ids:
        return gen  # start is a sink: no seeds (/root/reference/src/main.cpp:1120)
    spark = graph.spark
    # distributed seeding (same join shape as the batched kernels): the
    # source's successors never touch the driver — a 10M-fanout hub source
    # costs one broadcast join, not an out-degree-sized collect. A source
    # with no successors (/root/reference/src/main.cpp:1114-1117) simply
    # yields an empty seed set, which the kernel converges on immediately
    # and every accessor reads as the same empty result.
    src_df = spark.createDataFrame(
        [(0, sid, float(init_offset))], "qid long, sid long, ioff double"
    )
    seeds = (
        F.broadcast(src_df)
        .join(edges_w, F.col("sid") == edges_w["src"])
        .select(
            "qid",
            edges_w["dst"].alias("node"),
            F.col("ioff").alias("dist"),
            F.col("sid").alias("prev"),
            F.lit(NEG_INF).alias("prev_dist"),
        )
    )
    cutoffs = spark.createDataFrame([(0, float(cutoff))], "qid long, cutoff double")
    sinks_df = _encode_sinks_df(graph, sinks)
    state = bounded_sssp(spark, edges_w, seeds, cutoffs, sinks_df)
    gen.state = state.drop("qid")
    return gen


def shortest_path(
    graph: SparkDiGraph,
    source: str,
    target: str,
    cutoff: float,
    source_offset: Optional[float] = None,
    target_offset: Optional[float] = None,
    sinks: Optional[Sequence[str]] = None,
    endpoints=None,
) -> Optional[PathResult]:
    """Point-to-point shortest path (/root/reference/src/main.cpp:547-620).

    Offsets fold into a ``delta`` added after the kernel (source
    contributes ``length(source) - source_offset``, target contributes
    ``target_offset``, /root/reference/src/main.cpp:599-611). Same-node
    special cases per /root/reference/src/main.cpp:585-597.

    ``endpoints``: accepted for API parity with the reference's A* path
    (/root/reference/src/main.cpp:606-609). A* is a heap-ordering
    optimization whose result equals Dijkstra's; the fixpoint kernel has
    no heap, so endpoints do not change results (see operators/astar.py
    for the heuristic surface and the optional pruning rationale).

    Delegates to ``shortest_paths_pairs`` (a batch of one): seeding,
    kernel, and backtrace are all join-based and distributed — no
    driver-side successor collect even for a hub source.
    """
    return shortest_paths_pairs(
        graph,
        [(source, target, cutoff, source_offset, target_offset)],
        sinks=sinks,
    )[0]


def shortest_paths_pairs(
    graph: SparkDiGraph,
    pairs: Sequence[tuple],
    sinks: Optional[Sequence[str]] = None,
) -> dict[int, Optional[PathResult]]:
    """Batched point-to-point queries: ONE kernel run advances every pair.

    ``pairs``: [(source, target, cutoff, source_offset?, target_offset?)]
    -> {index: PathResult|None}, each entry exactly equal to the
    corresponding single ``shortest_path`` call. This is the
    scale-intended API (the single-pair wrapper exists for reference
    parity): seeds for all queries are built with one edges join, the
    label-correcting kernel relaxes all qids together, and backtraces run
    as one batched iterative join.
    """
    lm = graph.lengths_map
    nm = graph.names_map
    scale = graph.scale
    results: dict[int, Optional[PathResult]] = {}
    live: list[tuple[int, int, int, float, float]] = []  # qid, sid, tid, inner_cutoff, delta
    meta: dict[int, tuple] = {}
    sink_ids = {graph.node_id(s) for s in (sinks or [])} - {None}

    for qid, p in enumerate(pairs):
        source, target, cutoff = p[0], p[1], p[2]
        source_offset = p[3] if len(p) > 3 else None
        target_offset = p[4] if len(p) > 4 else None
        results[qid] = None
        if cutoff < 0:
            continue
        sid, tid = graph.node_id(source), graph.node_id(target)
        if sid is None or tid is None or sid not in lm or tid not in lm:
            continue
        if source_offset is not None:
            source_offset = clip(0.0, source_offset, lm[sid])
        if target_offset is not None:
            target_offset = clip(0.0, target_offset, lm[tid])
        if sid == tid:
            if source_offset is None and target_offset is None:
                results[qid] = PathResult(0.0, [nm[sid]]).round(scale).with_graph(graph)
            elif source_offset is not None and target_offset is not None:
                dist = target_offset - source_offset
                if 0 <= dist <= cutoff:
                    results[qid] = PathResult(
                        dist, [nm[sid]], source_offset, target_offset
                    ).round(scale).with_graph(graph)
            continue
        if sid in sink_ids:
            continue
        delta = 0.0
        if source_offset is not None:
            delta += lm[sid] - source_offset
        if target_offset is not None:
            delta += target_offset
        live.append((qid, sid, tid, float(cutoff - delta), delta))
        meta[qid] = (source_offset, target_offset)

    if not live:
        return results
    spark = graph.spark
    qdf = spark.createDataFrame(
        live, "qid long, sid long, tid long, cutoff double, delta double"
    )
    # seeds: successors of each query's source (cutoff-exempt, dist 0)
    seeds = (
        qdf.join(graph.edges_w, qdf["sid"] == graph.edges_w["src"])
        .select(
            "qid",
            graph.edges_w["dst"].alias("node"),
            F.lit(0.0).alias("dist"),
            qdf["sid"].alias("prev"),
            F.lit(NEG_INF).alias("prev_dist"),
        )
    )
    cutoffs = qdf.select("qid", "cutoff")
    sinks_df = None
    if sink_ids:
        sinks_df = qdf.select("qid").crossJoin(
            spark.createDataFrame([(s,) for s in sink_ids], "node long")
        )
    state = bounded_sssp(
        spark,
        graph.edges_w,
        seeds,
        cutoffs,
        sinks_df,
        targets=qdf.select("qid", F.col("tid").alias("node")),
    )
    hits = state.join(
        F.broadcast(qdf.select("qid", F.col("tid").alias("node"))), ["qid", "node"]
    ).select("qid", "dist")
    hit_rows = {r["qid"]: r["dist"] for r in hits.collect()}
    if not hit_rows:
        return results
    ends = spark.createDataFrame(
        [(q, t) for q, s, t, c, d in live if q in hit_rows], "qid long, node long"
    )
    sources = qdf.select("qid", F.col("sid").alias("start"))
    chains = backtrace(state, ends, sources)
    chain_rows = {r["qid"]: list(r["chain"]) for r in chains.collect()}
    delta_of = {q: d for q, s, t, c, d in live}
    for qid, dist in hit_rows.items():
        chain = chain_rows.get(qid)
        if not chain:
            continue
        so, to = meta[qid]
        nodes = [nm[i] for i in reversed(chain)]
        results[qid] = PathResult(dist + delta_of[qid], nodes, so, to).round(scale).with_graph(graph)
    return results
