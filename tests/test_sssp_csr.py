"""CSR-blocked kernel equals the plain kernel exactly (dists AND prevs)."""

from pyspark.sql import functions as F

from networkx_graph_spark.graph import SparkDiGraph
from networkx_graph_spark.operators.sssp import NEG_INF, bounded_sssp
from networkx_graph_spark.operators.sssp_csr import bounded_sssp_csr
from networkx_graph_spark.sources.datagen import uniform_edges


def _seeds_for(graph, sources):
    rows = []
    for qid, sid in sources:
        for r in graph.edges_w.filter(F.col("src") == sid).collect():
            rows.append((qid, r["dst"], 0.0, sid, NEG_INF))
    return graph.spark.createDataFrame(
        rows, "qid long, node long, dist double, prev long, prev_dist double"
    )


def test_csr_kernel_equivalence(spark):
    edges = uniform_edges(spark, 400, 2_000, seed=11).distinct()
    g = SparkDiGraph.from_edge_df(spark, edges)
    sources = [(0, 1), (1, 7), (2, 42)]
    seeds = _seeds_for(g, sources)
    cutoff = 5.0
    plain = bounded_sssp(spark, g.edges_w, seeds, float(cutoff))
    csr = bounded_sssp_csr(spark, g.edges_w, seeds, cutoff, num_blocks=4)
    a = {(r["qid"], r["node"]): (r["dist"], r["prev"]) for r in plain.collect()}
    b = {(r["qid"], r["node"]): (r["dist"], r["prev"]) for r in csr.collect()}
    assert a == b
    g.unpersist()


def test_csr_fixture_golden(graph1):
    # graph1 destinations from w1 via the CSR kernel
    seeds = _seeds_for(graph1, [(0, 1)])
    state = bounded_sssp_csr(graph1.spark, graph1.edges_w, seeds, 200.0, num_blocks=3)
    got = sorted((r["dist"], r["node"]) for r in state.collect())
    assert got == [(0.0, 2), (0.0, 3), (10.0, 4), (15.0, 5), (30.0, 6), (30.0, 7)]


def test_csr_superstep_reduction_on_chain(spark):
    """A 120-node path graph: the plain kernel needs ~120 supersteps; the
    range-blocked CSR kernel finishes within a handful (each block's
    30-node chain collapses locally). max_iter=8 proves the bound."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "src long, dst long"
    )
    g = SparkDiGraph.from_edge_df(spark, chain)
    seeds = _seeds_for(g, [(0, 0)])
    state = bounded_sssp_csr(
        g.spark, g.edges_w, seeds, 1e9, num_blocks=4, block_width=30, max_iter=8
    )
    got = {r["node"]: r["dist"] for r in state.collect()}
    assert got == {i: float(i - 1) for i in range(1, 120)}
    # the plain kernel, capped at the same 8 supersteps, cannot finish
    partial = bounded_sssp(g.spark, g.edges_w, seeds, 1e9, max_iter=8)
    assert partial.count() < 119
    g.unpersist()
