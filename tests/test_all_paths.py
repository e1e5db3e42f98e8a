"""All-paths enumeration goldens
(/root/reference/tests/test_basic.py:393-636)."""

from networkx_graph_spark.operators.paths import all_paths, all_paths_from, all_paths_to


def D(paths):
    return [p.to_dict() for p in paths]


def test_all_paths_from_basic(graph1):
    paths = D(all_paths_from(graph1, "w1", cutoff=10.0))
    assert paths == [
        {"dist": 10.0, "nodes": ["w1", "w2"], "start": ("w1", None), "end": ("w2", 10.0)},
        {"dist": 10.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", None), "end": ("w4", 0.0)},
    ]
    paths = D(all_paths_from(graph1, "w1", cutoff=10.0, sinks=["w3"]))
    assert paths == [
        {"dist": 10.0, "nodes": ["w1", "w2"], "start": ("w1", None), "end": ("w2", 10.0)},
        {"dist": 10.0, "nodes": ["w1", "w3"], "start": ("w1", None), "end": ("w3", 10.0)},
    ]


def test_all_paths_from_offsets(graph1):
    paths = D(all_paths_from(graph1, "w1", cutoff=5.0, offset=2.0))
    assert paths == [
        {"dist": 5.0, "nodes": ["w1"], "start": ("w1", 2.0), "end": ("w1", 7.0)}
    ]
    paths = D(all_paths_from(graph1, "w1", cutoff=15.0, offset=2.0))
    assert paths == [
        {"dist": 15.0, "nodes": ["w1", "w2"], "start": ("w1", 2.0), "end": ("w2", 7.0)},
        {"dist": 15.0, "nodes": ["w1", "w3"], "start": ("w1", 2.0), "end": ("w3", 7.0)},
    ]
    paths = D(all_paths_from(graph1, "w1", cutoff=25.0, offset=5.0))
    assert paths == [
        {"dist": 25.0, "nodes": ["w1", "w2", "w5"], "start": ("w1", 5.0), "end": ("w5", 5.0)},
        {"dist": 25.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", 5.0), "end": ("w4", 10.0)},
    ]
    paths = D(all_paths_from(graph1, "w1", cutoff=5.12345, offset=2.0))
    assert paths == [
        {"dist": 5.123, "nodes": ["w1"], "start": ("w1", 2.0), "end": ("w1", 7.123)}
    ]


def test_round_n_variants(spark):
    from networkx_graph_spark.graph import SparkDiGraph
    from tests.conftest import GRAPH1_EDGES, GRAPH1_NODES

    g_none = SparkDiGraph.from_lists(spark, GRAPH1_NODES, GRAPH1_EDGES, round_n=None)
    paths = D(all_paths_from(g_none, "w1", cutoff=5.12345, offset=2.0))
    assert paths == [
        {"dist": 5.12345, "nodes": ["w1"], "start": ("w1", 2.0), "end": ("w1", 7.12345)}
    ]
    g_neg = SparkDiGraph.from_lists(spark, GRAPH1_NODES, GRAPH1_EDGES, round_n=-1)
    paths = D(all_paths_from(g_neg, "w1", cutoff=5.12345, offset=2.0))
    # round_n=-1 -> scale 0.1: everything lands on the 10-grid
    assert paths == [
        {"dist": 10.0, "nodes": ["w1"], "start": ("w1", 0.0), "end": ("w1", 10.0)}
    ]


def _same(paths, want):
    """Order-insensitive within equal dist (the reference's tie order is
    unordered_set iteration order — unspecified)."""
    key = lambda d: (d["dist"], d["nodes"])  # noqa: E731
    return sorted(paths, key=key) == sorted(want, key=key)


def test_all_paths_to(graph1):
    paths = D(all_paths_to(graph1, "w7", cutoff=30.0, offset=4.0))
    assert _same(paths, [
        {"dist": 30.0, "nodes": ["w3", "w4", "w6", "w7"], "start": ("w3", 7.0), "end": ("w7", 4.0)},
        {"dist": 30.0, "nodes": ["w2", "w5", "w7"], "start": ("w2", 4.0), "end": ("w7", 4.0)},
    ])
    paths = D(all_paths_to(graph1, "w7", cutoff=30.0))
    assert _same(paths, [
        {"dist": 30.0, "nodes": ["w3", "w4", "w6", "w7"], "start": ("w3", 3.0), "end": ("w7", None)},
        {"dist": 30.0, "nodes": ["w1", "w2", "w5", "w7"], "start": ("w1", 10.0), "end": ("w7", None)},
    ])


def test_all_paths_p2p(graph2):
    assert all_paths(graph2, "w1", "w1", cutoff=20) == []
    paths = all_paths(graph2, "w1", "w1", cutoff=20, source_offset=3.0, target_offset=4.0)
    assert D(paths) == [
        {"dist": 1.0, "nodes": ["w1"], "start": ("w1", 3.0), "end": ("w1", 4.0)}
    ]
    assert (
        all_paths(graph2, "w1", "w1", cutoff=20, source_offset=13.0, target_offset=14.0)
        == []
    )

    paths = all_paths(graph2, "w1", "w4", cutoff=10)
    assert D(paths) == [
        {"dist": 10.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", None), "end": ("w4", None)}
    ]
    assert all_paths(graph2, "w1", "w4", cutoff=9) == []

    paths = all_paths(graph2, "w1", "w4", cutoff=20, target_offset=5)
    assert D(paths) == [
        {"dist": 15.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", None), "end": ("w4", 5.0)}
    ]
    assert all_paths(graph2, "w1", "w4", cutoff=14, target_offset=5) == []
    paths = all_paths(graph2, "w1", "w4", cutoff=20, source_offset=8, target_offset=5)
    assert D(paths) == [
        {"dist": 17.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", 8.0), "end": ("w4", 5.0)}
    ]

    paths = D(all_paths(graph2, "w1", "w7", cutoff=80))
    r1 = {"dist": 30.0, "nodes": ["w1", "w2", "w5", "w7"], "start": ("w1", None), "end": ("w7", None)}
    r2 = {"dist": 30.0, "nodes": ["w1", "w3", "w4", "w7"], "start": ("w1", None), "end": ("w7", None)}
    assert paths in ([r1, r2], [r2, r1])

    paths = D(all_paths(graph2, "w1", "w7", cutoff=80, source_offset=3.0, target_offset=4.0))
    r1 = {"dist": 41.0, "nodes": ["w1", "w2", "w5", "w7"], "start": ("w1", 3.0), "end": ("w7", 4.0)}
    r2 = {"dist": 41.0, "nodes": ["w1", "w3", "w4", "w7"], "start": ("w1", 3.0), "end": ("w7", 4.0)}
    assert paths in ([r1, r2], [r2, r1])

    paths = all_paths(
        graph2, "w1", "w7", cutoff=80, source_offset=3.0, target_offset=4.0, sinks=["w4"]
    )
    assert D(paths) == [r1]


def test_all_paths_python_oracle(graph1):
    # cross-check vs the reference's own pure-python oracle
    # (/root/reference/tests/test_basic.py:360-390)
    def oracle(succ, lengths, start, cutoff):
        output = []

        def backtrace(path, length):
            if length > cutoff:
                return
            nexts = succ.get(path[-1], [])
            if not nexts:
                output.append((length, path))
                return
            if len(path) > 1:
                new_length = length + lengths[path[-1]]
                if new_length > cutoff:
                    output.append((length, path))
                    return
                length = new_length
            n0 = len(output)
            for nid in nexts:
                if nid in path:
                    continue
                backtrace([*path, nid], length)
            if len(output) == n0:
                output.append((length, path))

        backtrace([start], 0.0)
        return sorted(
            [{"dist": round(d, 3), "nodes": p} for d, p in output],
            key=lambda x: (x["dist"], x["nodes"]),
        )

    succ = {"w1": ["w2", "w3"], "w2": ["w5"], "w3": ["w4"], "w4": ["w6"], "w6": ["w7"], "w5": ["w7"]}
    lengths = {"w1": 10.0, "w2": 15.0, "w3": 10.0, "w4": 20.0, "w5": 15.0, "w6": 3.0, "w7": 10.0}
    for cutoff in (10.0, 25.0, 33.0, 60.0):
        want = oracle(succ, lengths, "w1", cutoff)
        got = [
            {"dist": p.dist, "nodes": p.nodes}
            for p in all_paths_from(graph1, "w1", cutoff=cutoff)
        ]
        # oracle emits truncated paths with pre-truncation dist; the engine
        # reports dist=cutoff for truncated paths (reference Path semantics),
        # so compare node sets and count
        assert sorted(tuple(p["nodes"]) for p in got) == sorted(
            tuple(p["nodes"]) for p in want
        ), cutoff
