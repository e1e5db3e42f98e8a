"""Remaining ShortestPathGenerator goldens
(/root/reference/tests/test_basic.py:654-868) + binary UBODT md5 golden
(:1584-1595) + misc parity surfaces."""

import hashlib

from networkx_graph_spark.operators.sssp import shortest_paths


def test_generator_paths_cutoff20(graph1):
    gen = shortest_paths(graph1, "w1", cutoff=20.0)
    assert gen.destinations() == [(0.0, "w2"), (0.0, "w3"), (10.0, "w4"), (15.0, "w5")]
    paths = [p.to_dict() for p in gen.paths()]
    assert len(paths) == 2
    want = [
        {"dist": 20.0, "nodes": ["w1", "w3", "w4"], "start": ("w1", None), "end": ("w4", 10.0)},
        {"dist": 20.0, "nodes": ["w1", "w2", "w5"], "start": ("w1", None), "end": ("w5", 5.0)},
    ]
    assert sorted(paths, key=lambda d: d["nodes"]) == sorted(want, key=lambda d: d["nodes"])


def test_generator_sinks(graph1):
    gen = shortest_paths(graph1, "w1", cutoff=20.0, sinks=["w2", "w3"])
    assert gen.destinations() == [(0.0, "w2"), (0.0, "w3")]
    assert gen.to_dict() == {"cutoff": 20.0, "source": ("w1", None)}

    gen = shortest_paths(graph1, "w1", cutoff=20.0, offset=5.0, sinks=["w6"])
    assert sorted(gen.destinations()) == sorted(
        [(5.0, "w2"), (5.0, "w3"), (15.0, "w4"), (20.0, "w5")]
    )
    assert gen.to_dict() == {"cutoff": 20.0, "source": ("w1", 5.0)}


def test_generator_sinks_cutoff80(graph1):
    gen = shortest_paths(graph1, "w1", cutoff=80.0, offset=5.0, sinks=["w6"])
    assert gen.prevs() == {
        "w2": "w1", "w3": "w1", "w4": "w3", "w5": "w2", "w6": "w4", "w7": "w5",
    }
    assert gen.dists() == {
        "w2": 5.0, "w3": 5.0, "w4": 15.0, "w5": 20.0, "w6": 35.0, "w7": 35.0,
    }
    assert gen.source_info() == ("w1", 5.0)
    assert gen.target_info() is None
    paths = [p.to_dict() for p in gen.paths()]
    assert len(paths) == 2
    assert paths[0] == {
        "dist": 45.0,
        "nodes": ["w1", "w2", "w5", "w7"],
        "start": ("w1", 5.0),
        "end": ("w7", 10.0),
    }
    assert paths[1] == {
        "dist": 38.0,
        "nodes": ["w1", "w3", "w4", "w6"],
        "start": ("w1", 5.0),
        "end": ("w6", 3.0),
    }


def test_generator_single_node_variants(graph1):
    gen = shortest_paths(graph1, "w1", cutoff=2.0, offset=6.0)
    paths = [p.to_dict() for p in gen.paths()]
    assert paths == [
        {"dist": 2.0, "nodes": ["w1"], "start": ("w1", 6.0), "end": ("w1", 8.0)}
    ]
    # offset just past the remaining-length boundary still expands
    gen = shortest_paths(graph1, "w1", cutoff=40.0, offset=6.000001, sinks=["w6"])
    paths = [p.to_dict() for p in gen.paths()]
    assert len(paths) == 2
    assert paths[0] == {
        "dist": 40.0,
        "nodes": ["w1", "w2", "w5", "w7"],
        "start": ("w1", 6.0),
        "end": ("w7", 6.0),
    }
    assert paths[1] == {
        "dist": 37.0,
        "nodes": ["w1", "w3", "w4", "w6"],
        "start": ("w1", 6.0),
        "end": ("w6", 3.0),
    }
    # single-node reverse path (test_basic.py:800-812 forward variant)
    gen = shortest_paths(graph1, "w7", cutoff=20.0, offset=3.0)
    paths = [p.to_dict() for p in gen.paths()]
    assert paths == [
        {"dist": 7.0, "nodes": ["w7"], "start": ("w7", 3.0), "end": ("w7", 10.0)}
    ]


def test_generator_reverse_paths(graph1):
    gen = shortest_paths(graph1, "w7", cutoff=20.0, offset=3.0, reverse=True)
    paths = [p.to_dict() for p in gen.paths()]
    assert len(paths) == 2
    path1 = {
        "dist": 20.0,
        "nodes": ["w2", "w5", "w7"],
        "start": ("w2", 13.0),
        "end": ("w7", 3.0),
    }
    path2 = {
        "dist": 20.0,
        "nodes": ["w4", "w6", "w7"],
        "start": ("w4", 6.0),
        "end": ("w7", 3.0),
    }
    assert sorted(paths, key=lambda d: d["nodes"]) == sorted(
        [path1, path2], key=lambda d: d["nodes"]
    )
    assert gen.to_dict() == {"cutoff": 20.0, "target": ("w7", 3.0)}
    assert gen.path("w5").to_dict() == {
        "dist": 18.0,
        "nodes": ["w5", "w7"],
        "start": ("w5", 0.0),
        "end": ("w7", 3.0),
    }
    assert gen.path("w6").to_dict() == {
        "dist": 6.0,
        "nodes": ["w6", "w7"],
        "start": ("w6", 0.0),
        "end": ("w7", 3.0),
    }
    assert gen.prevs() == {"w2": "w5", "w4": "w6", "w5": "w7", "w6": "w7"}
    assert gen.dists() == {"w2": 18.0, "w4": 6.0, "w5": 3.0, "w6": 3.0}
    assert gen.path("w7") is None


def test_graph2_generator(graph2):
    gen = shortest_paths(graph2, "w1", cutoff=80.0, offset=6.0)
    paths = gen.paths()
    assert len(paths) == 2
    destinations = [(p.nodes[-1], p.end_offset) for p in paths]
    assert ("w7", 10.0) in destinations


def test_ubodt_binary_md5(graph1, spark, tmp_path):
    """The reference's own md5 golden for the packed binary dump
    (/root/reference/tests/test_basic.py:1584-1595)."""
    from networkx_graph_spark.operators.ubodt import (
        build_ubodt,
        dump_ubodt_binary,
        load_ubodt_binary,
        ubodt_sorted,
    )

    ub = build_ubodt(graph1, 100.0)
    p = str(tmp_path / "ubodt.bin")
    assert dump_ubodt_binary(ub, p)
    md5 = hashlib.md5(open(p, "rb").read()).hexdigest()
    assert md5 == "f2c5dced545563b8f5fff3a6a52985f7"
    loaded = load_ubodt_binary(spark, p)
    assert sorted(map(tuple, loaded.collect())) == sorted(
        map(tuple, ubodt_sorted(ub).collect())
    )


def test_sibs_maps(graph1):
    assert graph1.sibs_under_next_map() == {"w2": {"w3"}, "w3": {"w2"}}
    assert graph1.sibs_under_prev_map() == {"w5": {"w6"}, "w6": {"w5"}}


def test_endpoints_and_astar_parity(graph1):
    from networkx_graph_spark.operators.astar import cheap_ruler_k, encode_endpoints, heuristic
    from networkx_graph_spark.operators.sssp import shortest_path

    ep = encode_endpoints(graph1, {"w1": ([1, 3, 3], [5, 3, 3]), "w7": ([9, 3, 3], [12, 3, 3])})
    assert ep.is_wgs84
    assert heuristic(ep, graph1.node_id("w1"), graph1.node_id("w7")) > 0
    kx, ky = cheap_ruler_k(3.0)
    assert 100_000 < kx < 120_000 and 100_000 < ky < 120_000
    # endpoints don't change results (A* == Dijkstra)
    with_ep = shortest_path(graph1, "w1", "w7", cutoff=40.0, endpoints=ep)
    without = shortest_path(graph1, "w1", "w7", cutoff=40.0)
    assert with_ep.to_dict() == without.to_dict()


def test_scalar_smoke():
    from networkx_graph_spark.functions.scalar import add, subtract

    assert add(1, 2) == 3
    assert subtract(1, 2) == -1


def test_astar_heuristic_reference_geometry(graph1):
    """h() must measure node-TAIL -> target-HEAD with cheap-ruler factors
    at the TARGET head's latitude (/root/reference/src/main.cpp:1262-1279)."""
    import math

    from networkx_graph_spark.operators.astar import (
        Endpoints,
        cheap_ruler_k,
        heuristic,
    )

    ep = Endpoints(
        {
            1: ((0.0, 0.0, 0.0), (1.0, 2.0, 5.0)),  # node: head, TAIL
            7: ((3.0, 4.0, 7.0), (9.0, 9.0, 9.0)),  # target: HEAD, tail
        },
        is_wgs84=True,
    )
    kx, ky = cheap_ruler_k(4.0)  # target head latitude
    want = math.sqrt(((3.0 - 1.0) * kx) ** 2 + ((4.0 - 2.0) * ky) ** 2 + (7.0 - 5.0) ** 2)
    assert heuristic(ep, 1, 7) == want
    assert heuristic(ep, 1, 99) == 0.0  # unknown endpoint -> admissible 0
