"""Batched p2p API: every entry equals the single shortest_path call."""

from networkx_graph_spark.operators.sssp import shortest_path, shortest_paths_pairs


def test_batch_matches_single(graph1):
    pairs = [
        ("w1", "w7", 37.0, 3.0, None),
        ("w1", "w7", 37.0 - 1e-3, 3.0, None),
        ("w1", "w7", 30.0),
        ("w1", "w7", 30.0 - 1e-3),
        ("w1", "w7", 33.0, 9.0, 1.0),
        ("w3", "w7", 50.0),
        ("w2", "w4", 100.0),  # unreachable
        ("w1", "w1", 5.0, 2.0, 6.0),
        ("w1", "w1", 5.0),
        ("missing", "w7", 10.0),
        ("w1", "w7", -1.0),
    ]
    batch = shortest_paths_pairs(graph1, pairs)
    for i, p in enumerate(pairs):
        single = shortest_path(
            graph1,
            p[0],
            p[1],
            p[2],
            p[3] if len(p) > 3 else None,
            p[4] if len(p) > 4 else None,
        )
        got = batch[i]
        if single is None:
            assert got is None, (i, got and got.to_dict())
        else:
            assert got is not None, (i, p)
            assert got.to_dict() == single.to_dict(), i


def test_batch_with_sinks(graph1):
    batch = shortest_paths_pairs(
        graph1, [("w1", "w7", 40.0), ("w1", "w5", 40.0)], sinks=["w5"]
    )
    assert batch[0].to_dict()["nodes"] == ["w1", "w3", "w4", "w6", "w7"]
    # sinks can be arrived at
    assert batch[1] is not None and batch[1].nodes == ["w1", "w2", "w5"]
