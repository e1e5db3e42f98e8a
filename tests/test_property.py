"""Property-based kernel checks (hypothesis): random small graphs vs
exact pure-Python oracles. Complements the fixed-seed golden tests —
the generators explore graph shapes (self-loops, multi-edges collapsed,
disconnected parts, dangling sinks) the fixtures don't.

Weights are multiples of 0.5, so every path sum is exact in binary FP and
the lexicographic tie-break comparison is FP-order-independent.
"""

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

NEG_INF = float("-inf")

edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=18,
).map(lambda es: sorted({(a, b) for a, b in es if a != b}))

weighted_edges = st.lists(
    st.tuples(
        st.integers(0, 6),
        st.integers(0, 6),
        st.integers(1, 8),  # weight = k * 0.5
    ),
    min_size=1,
    max_size=14,
).map(
    lambda es: sorted({(a, b): w for a, b, w in es if a != b}.items())
).map(lambda es: [(a, b, w * 0.5) for (a, b), w in es])


def _sssp_oracle(edges, source, cutoff):
    """Label-correcting fixpoint with the kernel's exact tie-break
    struct (dist, prev_dist, prev); seeds carry prev_dist=-inf."""
    best = {source: (0.0, NEG_INF, -1)}
    changed = True
    while changed:
        changed = False
        for a, b, w in edges:
            if a not in best:
                continue
            da = best[a][0]
            nd = da + w
            if nd > cutoff:
                continue
            cand = (nd, da, a)
            if b not in best or cand < best[b]:
                best[b] = cand
                changed = True
    return best


@pytest.mark.parametrize("hypothesis_bucket", [0])
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=weighted_edges, cutoff_k=st.integers(1, 20))
def test_sssp_matches_oracle(spark, edges, cutoff_k, hypothesis_bucket):
    from pyspark.sql import functions as F  # noqa: F401

    from networkx_graph_spark.operators.sssp import bounded_sssp

    assume(edges)  # self-loop stripping can empty the list
    cutoff = cutoff_k * 0.5
    source = edges[0][0]
    edf = spark.createDataFrame(edges, "src long, dst long, weight double")
    seeds = spark.createDataFrame(
        [(0, source, 0.0, -1, NEG_INF)],
        "qid long, node long, dist double, prev long, prev_dist double",
    )
    got = {
        r["node"]: (r["dist"], r["prev_dist"], r["prev"])
        for r in bounded_sssp(spark, edf, seeds, cutoffs=cutoff).collect()
    }
    want = _sssp_oracle(edges, source, cutoff)
    assert got == want


def _cc_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("algorithm", ["hashmin", "twophase"])
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, algorithm, edges):
    from networkx_graph_spark.kernels.components import connected_components

    assume(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(e, algorithm=algorithm).state.collect()
    }
    want = _cc_oracle(edges)
    # vertices with only self-loops were stripped by the edge list map;
    # both sides cover exactly the endpoint set
    assert got == want
