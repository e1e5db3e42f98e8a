"""Binding-target searches: nearest/all interval-anchored POIs within cutoff.

Reference: ``shortest_path_to_bindings`` wrapper
(/root/reference/src/main.cpp:834-880), kernel (:1476-1631);
``distance_to_bindings`` (:881-899); ``all_paths_to_bindings``
(:901-948), kernels (:1760-1908, :1910-1993).

Bindings are per-node sorted interval lists ``node -> [(lo, hi, payload)]``
(sorted by (lo, hi), /root/reference/src/main.cpp:446-461). Semantics
replicated exactly:

- same-node fast path (only when an offset is given): forward takes the
  FIRST interval with ``lo >= offset``; backward takes the LAST interval
  with ``hi <= offset`` (:1486-1522). If one matches, the result is that
  single-node path or nothing (no fallthrough to the graph search when the
  match exceeds the cutoff, :1518-1520).
- graph search: Dijkstra that stops at the first *popped* binding node
  (:1552-1582). Because Dijkstra pops in (dist, node) order and binding
  nodes never relax out, this equals: run the bounded SSSP kernel with
  binding nodes added to the sink barrier set, then pick
  ``argmin (dist, node)`` over reached binding nodes — and only then apply
  the total-cost check ``dist + binding_offset_cost <= cutoff`` (if the
  first binding node fails it, the answer is None, not the next node).
- binding offset cost: forward ``c = clip(0, lo_first, len)`` costs ``c``;
  backward ``c = clip(0, hi_last, len)`` costs ``len - c`` (:1557-1581).
- forward paths read ``[source..u]``; backward paths read ``[u..source]``
  (already forward order) with start/end offsets swapped (:1617-1629).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from ..graph import SparkDiGraph
from ..rounding import clip
from .paths import all_paths_from, all_paths_to
from .sssp import NEG_INF, PathResult, bounded_sssp

Binding = tuple[float, float, object]


def encode_bindings(
    graph: SparkDiGraph, bindings: dict[str, list[Binding]]
) -> dict[int, list[Binding]]:
    """node-str -> sorted interval lists, keyed by node id
    (/root/reference/src/main.cpp:446-461)."""
    out: dict[int, list[Binding]] = {}
    for node, lst in bindings.items():
        nid = graph.node_id(node)
        if nid is None:
            nid = graph.indexer.id(node) if graph.indexer else None
        if nid is None:
            continue
        out[nid] = sorted(
            [(float(lo), float(hi), payload) for lo, hi, payload in lst],
            key=lambda t: (t[0], t[1]),
        )
    return out


def _same_node(
    source: int,
    offset: float,
    blist: list[Binding],
    reverse: bool,
    cutoff: float,
    name: str,
) -> tuple[bool, Optional[PathResult]]:
    """(matched, path). matched=True means no fallthrough
    (/root/reference/src/main.cpp:1486-1522)."""
    if not reverse:
        for t in blist:
            if t[0] >= offset:
                p = PathResult(t[0] - offset, [name], offset, t[0])
                p.binding = (name, t)
                return True, (p if p.dist <= cutoff else None)
    else:
        for t in reversed(blist):
            if t[1] <= offset:
                p = PathResult(offset - t[1], [name], t[1], offset)
                p.binding = (name, t)
                return True, (p if p.dist <= cutoff else None)
    return False, None


def _binding_cost(
    lm: dict[int, float], b: dict[int, list[Binding]], u: int, reverse: bool
) -> tuple[float, Binding, float]:
    """(offset cost, winning interval, clipped binding offset) at node u
    (/root/reference/src/main.cpp:1557-1581)."""
    length = lm[u]
    t = b[u][0] if not reverse else b[u][-1]
    if not reverse:
        c = clip(0.0, t[0], length)
        return c, t, c
    c = clip(0.0, t[1], length)
    return length - c, t, c


def _shortest_many(
    graph: SparkDiGraph,
    queries: list[tuple[str, Optional[float]]],
    cutoff: float,
    b: dict[int, list[Binding]],
    sink_ids: set[int],
    reverse: bool,
) -> list[Optional[PathResult]]:
    """qid-batched binding search: ALL queries advance through ONE
    multi-source run of the bounded-SSSP kernel (binding nodes as per-qid
    barriers), then per-query argmin + backtrace driver-side. One Spark
    fixpoint for |Q| queries instead of |Q| sequential kernels — the same
    batching shape as ``shortest_paths_pairs``."""
    nm = graph.names_map
    lm = graph.lengths_map
    out: list[Optional[PathResult]] = [None] * len(queries)
    pend: list[tuple[int, int, float]] = []
    for qid, (source, offset) in enumerate(queries):
        sid = graph.node_id(source)
        if sid is None or sid not in lm:
            continue
        blist = b.get(sid)
        if offset is not None and blist:
            matched, p = _same_node(sid, offset, blist, reverse, cutoff, nm[sid])
            if matched:
                out[qid] = (
                    p.round(graph.scale).with_graph(graph) if p is not None else None
                )
                continue
        if sid in sink_ids:
            continue
        init_offset = 0.0
        if offset is not None:
            # raw offset, no clip (/root/reference/src/main.cpp:1535-1538)
            init_offset = offset if reverse else lm[sid] - offset
        pend.append((qid, sid, float(init_offset)))
    if not pend:
        return out
    spark = graph.spark
    edges_w = graph.edges_w_rev if reverse else graph.edges_w
    src_df = spark.createDataFrame(pend, "qid long, sid long, ioff double")
    # distributed seeding: successors of every source in one broadcast
    # join (no per-query driver collect)
    seeds = F.broadcast(src_df).join(
        edges_w, F.col("sid") == edges_w["src"]
    ).select(
        "qid",
        edges_w["dst"].alias("node"),
        F.col("ioff").alias("dist"),
        F.col("sid").alias("prev"),
        F.lit(NEG_INF).alias("prev_dist"),
    )
    binding_nodes = {n for n, lst in b.items() if lst}
    barrier = sink_ids | binding_nodes
    sinks_df = None
    if barrier:
        bar_df = spark.createDataFrame([(x,) for x in barrier], "node long")
        # per-qid barrier: every sink/binding node EXCEPT the query's own
        # source (a binding source never barriers its own walk,
        # /root/reference/src/main.cpp:1540-1545)
        sinks_df = (
            src_df.select("qid", "sid")
            .crossJoin(bar_df)
            .filter(F.col("node") != F.col("sid"))
            .select("qid", "node")
        )
    state = bounded_sssp(spark, edges_w, seeds, float(cutoff), sinks_df)
    state = state.persist()

    # Distributed first-pop: ``argmin (dist, node)`` over reached binding
    # nodes per query == Dijkstra's first pop
    # (/root/reference/src/main.cpp:1552-1582). Only ONE small row per
    # query reaches the driver — the converged state is never collected.
    nm = graph.names_map
    lm = graph.lengths_map
    bn_df = spark.createDataFrame([(x,) for x in binding_nodes], "node long")
    winners = {
        r["qid"]: (r["m"]["dist"], r["m"]["node"])
        for r in (
            state.join(F.broadcast(bn_df), "node")
            .join(F.broadcast(src_df.select("qid", "sid")), "qid")
            .filter((F.col("node") != F.col("sid")) & (F.col("dist") <= F.lit(float(cutoff))))
            .groupBy("qid")
            .agg(F.min(F.struct("dist", "node")).alias("m"))
            .collect()
        )
    }
    # total-cost check with NO fallthrough to the next candidate
    # (:1582 break); survivors get a distributed backtrace
    ends, meta = [], {}
    for qid, sid, _ in pend:
        if qid not in winners:
            continue
        dist_u, u = winners[qid]
        cost, t, c = _binding_cost(lm, b, u, reverse)
        total = dist_u + cost
        if total > cutoff:
            continue
        ends.append((qid, u))
        meta[qid] = (sid, u, total, t, c)
    if ends:
        from .sssp import backtrace

        ends_df = spark.createDataFrame(ends, "qid long, node long")
        sources_df = spark.createDataFrame(
            [(q, s) for q, s, _ in pend], "qid long, start long"
        )
        chains = {
            r["qid"]: list(r["chain"])
            for r in backtrace(state, ends_df, sources_df).collect()
        }
        for qid, (sid, u, total, t, c) in meta.items():
            chain = chains.get(qid)  # [u .. sid]
            if not chain:
                continue
            offset = queries[qid][1]
            if not reverse:
                nodes = [nm[i] for i in reversed(chain)]
                p = PathResult(total, nodes, offset, c)
            else:
                nodes = [nm[i] for i in chain]  # forward order [u..source]
                p = PathResult(total, nodes, c, offset)
            p.binding = (nm[u], t)
            out[qid] = p.round(graph.scale).with_graph(graph)
    state.unpersist()
    return out


def shortest_path_to_bindings_pairs(
    graph: SparkDiGraph,
    queries: list[tuple[str, Optional[float]]],
    cutoff: float,
    bindings: dict[int, list[Binding]],
    direction: int = 0,
    sinks: Optional[Sequence[str]] = None,
) -> list[tuple[Optional[PathResult], Optional[PathResult]]]:
    """Batched ``shortest_path_to_bindings``: one (source, offset) per
    query, shared cutoff/bindings/sinks. Returns one (backwards, forwards)
    pair per query — element-wise identical to calling the single-query
    API in a loop, but each direction runs ONE qid-parallel kernel."""
    n = len(queries)
    if cutoff < 0 or n == 0:
        return [(None, None)] * n
    sink_ids = {graph.node_id(s) for s in (sinks or [])} - {None}
    fwd = (
        _shortest_many(graph, queries, cutoff, bindings, sink_ids, False)
        if direction >= 0
        else [None] * n
    )
    bwd = (
        _shortest_many(graph, queries, cutoff, bindings, sink_ids, True)
        if direction <= 0
        else [None] * n
    )
    return list(zip(bwd, fwd))


def shortest_path_to_bindings(
    graph: SparkDiGraph,
    source: str,
    cutoff: float,
    bindings: dict[int, list[Binding]],
    offset: Optional[float] = None,
    direction: int = 0,
    sinks: Optional[Sequence[str]] = None,
) -> tuple[Optional[PathResult], Optional[PathResult]]:
    """-> (backwards, forwards) (/root/reference/src/main.cpp:834-880).
    Delegates to the qid-batched kernel with a single query — one code
    path for both the single and batched surfaces."""
    res = shortest_path_to_bindings_pairs(
        graph, [(source, offset)], cutoff, bindings, direction, sinks
    )
    return res[0] if res else (None, None)


def distance_to_bindings(
    graph: SparkDiGraph,
    source: str,
    cutoff: float,
    bindings: dict[int, list[Binding]],
    offset: Optional[float] = None,
    direction: int = 0,
    sinks: Optional[Sequence[str]] = None,
) -> tuple[Optional[float], Optional[float]]:
    bwd, fwd = shortest_path_to_bindings(
        graph, source, cutoff, bindings, offset, direction, sinks
    )
    return (bwd.dist if bwd else None, fwd.dist if fwd else None)


def _enumerate_to_bindings(
    graph: SparkDiGraph,
    sid: int,
    offset: Optional[float],
    cutoff: float,
    b: dict[int, list[Binding]],
    sink_ids: set[int],
    reverse: bool,
) -> list[PathResult]:
    """__all_path_to_bindings__ (/root/reference/src/main.cpp:1760-1908)."""
    nm = graph.names_map
    lm = graph.lengths_map
    name = nm[sid]
    blist = b.get(sid)
    if offset is not None and blist:
        matched, p = _same_node(sid, offset, blist, reverse, cutoff, name)
        if matched:
            return [p.round(graph.scale).with_graph(graph)] if p is not None else []
    if sid in sink_ids:
        return []
    init_offset = 0.0
    clipped = offset
    if offset is not None:
        clipped = clip(0.0, offset, lm[sid])  # clipped HERE (:1816)
        init_offset = clipped if reverse else lm[sid] - clipped
        if init_offset > cutoff:
            return []
    spark = graph.spark
    edges_w = graph.edges_w_rev if reverse else graph.edges_w
    if edges_w.filter(F.col("src") == sid).isEmpty():
        return []
    from pyspark.sql import Observation

    from ..plans.supersteps import Materializer

    binding_nodes = {n for n, lst in b.items() if lst and n != sid}
    # flagged single state (the repo-wide 1-action/round pattern): hit
    # rows accumulate with _hit=true, live frontier rows carry _hit=false;
    # the live count rides the round's checkpoint action as an
    # Observation metric — no isEmpty / per-round hit collect jobs
    state = spark.createDataFrame(
        [([sid], float(init_offset), False)],
        "nodes array<bigint>, length double, _hit boolean",
    )
    lengths = graph.vertices.select(
        F.col("id").alias("tail"), F.col("length").alias("tail_len")
    )
    mat = Materializer()
    for _ in range(10_000):
        cur = (
            state.filter(~F.col("_hit"))
            .filter(F.col("length") <= cutoff)
            .withColumn("tail", F.element_at("nodes", -1))
            .join(lengths, "tail")
        )
        # binding hit (tail != source — root rows have size 1 & tail==sid)
        hit_cond = F.col("tail").isin(list(binding_nodes)) if binding_nodes else F.lit(False)
        hit_cond = hit_cond & (F.col("tail") != sid)
        # hits record their length BEFORE the tail-length add (:1849)
        hits = cur.filter(hit_cond).select("nodes", "length", F.lit(True).alias("_hit"))
        rows = cur.filter(~hit_cond)
        if sink_ids:
            rows = rows.filter(~F.col("tail").isin(list(sink_ids)))
        multi = F.size("nodes") > 1
        rows = rows.withColumn(
            "length",
            F.when(multi, F.col("length") + F.col("tail_len")).otherwise(F.col("length")),
        )
        cand = rows.join(
            edges_w.select(F.col("src").alias("tail"), "dst"), "tail", "left"
        )
        per = cand.groupBy("nodes", "length").agg(
            F.array_sort(
                F.collect_list(
                    F.when(~F.array_contains("nodes", F.col("dst")), F.col("dst"))
                )
            ).alias("cands")
        )
        expanded = (
            per.filter(F.size("cands") > 0)
            .select(F.explode("cands").alias("nxt"), "nodes", "length")
            .select(
                F.concat("nodes", F.array("nxt")).alias("nodes"),
                "length",
                F.lit(False).alias("_hit"),
            )
        )
        new_state = state.filter(F.col("_hit")).unionByName(hits).unionByName(expanded)
        obs = Observation()
        observed = new_state.observe(
            obs,
            F.coalesce(F.sum((~F.col("_hit")).cast("long")), F.lit(0)).alias("n_live"),
        )
        state = mat.materialize(observed)
        if obs.get["n_live"] == 0:
            break
    found = [
        (list(r["nodes"]), r["length"])
        for r in state.filter(F.col("_hit")).select("nodes", "length").collect()
    ]
    mat.release()
    out = []
    for nodes, length in found:
        tail = nodes[-1]
        tl = lm[tail]
        if not reverse:
            t = b[tail][0]
            c = clip(0.0, t[0], tl)
            if length + c > cutoff:
                continue
            p = PathResult(length + c, [nm[i] for i in nodes], clipped, c)
            p.binding = (nm[tail], t)
        else:
            t = b[tail][-1]
            c = clip(0.0, t[1], tl)
            if length + (tl - c) > cutoff:
                continue
            # reverse: reverse node list + swap offsets (:1898-1902)
            p = PathResult(
                length + (tl - c), [nm[i] for i in reversed(nodes)], c, clipped
            )
            p.binding = (nm[tail], t)
        out.append(p.round(graph.scale).with_graph(graph))
    out.sort(key=lambda p: (p.dist, p.nodes))
    return out


def all_paths_to_bindings(
    graph: SparkDiGraph,
    source: str,
    cutoff: float,
    bindings: dict[int, list[Binding]],
    offset: Optional[float] = None,
    direction: int = 0,
    sinks: Optional[Sequence[str]] = None,
    with_endings: bool = False,
) -> tuple[list[PathResult], list[PathResult]]:
    """-> (backwards, forwards) (/root/reference/src/main.cpp:901-948)."""
    if cutoff < 0:
        return [], []
    sid = graph.node_id(source)
    if sid is None or sid not in graph.lengths_map:
        return [], []
    sink_ids = {graph.node_id(s) for s in (sinks or [])} - {None}
    sink_names = [s for s in (sinks or [])]

    def one(reverse: bool) -> list[PathResult]:
        paths = _enumerate_to_bindings(
            graph, sid, offset, cutoff, bindings, sink_ids, reverse
        )
        if not with_endings:
            return paths
        # append cutoff/dead-end paths not prefixed/suffixed by a binding
        # path, with synthetic (off, off, None) bindings (:1910-1993)
        if not reverse:
            endings = all_paths_from(graph, source, cutoff, offset, sink_names)
            kept = []
            for ep in endings:
                if any(
                    len(bp.nodes) <= len(ep.nodes)
                    and ep.nodes[: len(bp.nodes)] == bp.nodes
                    for bp in paths
                ):
                    continue
                off = ep.end_offset
                ep.binding = (ep.nodes[-1], (off, off, None))
                kept.append(ep)
        else:
            endings = all_paths_to(graph, source, cutoff, offset, sink_names)
            kept = []
            for ep in endings:
                if any(
                    len(bp.nodes) <= len(ep.nodes)
                    and ep.nodes[-len(bp.nodes):] == bp.nodes
                    for bp in paths
                ):
                    continue
                off = ep.start_offset
                ep.binding = (ep.nodes[0], (off, off, None))
                kept.append(ep)
        return paths + kept

    fwd = one(False) if direction >= 0 else []
    bwd = one(True) if direction <= 0 else []
    return bwd, fwd
