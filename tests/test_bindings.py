"""Binding search goldens (/root/reference/tests/test_basic.py:871-1271)."""

import pytest

from networkx_graph_spark.operators.bindings import (
    all_paths_to_bindings,
    distance_to_bindings,
    encode_bindings,
    shortest_path_to_bindings,
)


@pytest.fixture(scope="module")
def bnd(graph1):
    obj1 = {}
    return encode_bindings(graph1, {"w3": [(1, 3, obj1)], "w7": [(3, 4, "obj2")]}), obj1


def test_shortest_bindings_basic(graph1, bnd):
    b, obj1 = bnd
    backwards, forwards = shortest_path_to_bindings(graph1, "w1", 50.0, b)
    assert backwards is None
    assert forwards.to_dict() == {
        "dist": 1.0,
        "nodes": ["w1", "w3"],
        "start": ("w1", None),
        "end": ("w3", 1.0),
        "binding": ("w3", (1.0, 3.0, obj1)),
    }
    # binding nodes are found even when they are sinks (binding check
    # precedes the sink check at pop)
    _, forwards2 = shortest_path_to_bindings(graph1, "w1", 50.0, b, sinks=["w3"])
    assert forwards2.to_dict() == forwards.to_dict()

    _, forwards = shortest_path_to_bindings(graph1, "w3", 50.0, b)
    assert forwards.to_dict() == {
        "dist": 26.0,
        "nodes": ["w3", "w4", "w6", "w7"],
        "start": ("w3", None),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj2")),
    }


def test_shortest_bindings_same_node_offsets(graph1, bnd):
    b, obj1 = bnd
    _, forwards = shortest_path_to_bindings(graph1, "w3", 50.0, b, offset=1.0)
    assert forwards.to_dict() == {
        "dist": 0.0,
        "nodes": ["w3"],
        "start": ("w3", 1.0),
        "end": ("w3", 1.0),
        "binding": ("w3", (1.0, 3.0, obj1)),
    }
    # epsilon probe: offset just past the interval start skips the fast path
    _, forwards = shortest_path_to_bindings(graph1, "w3", 50.0, b, offset=1.0 + 1e-8)
    assert forwards.to_dict() == {
        "dist": 35.0,
        "nodes": ["w3", "w4", "w6", "w7"],
        "start": ("w3", 1.0),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj2")),
    }

    backwards, forwards = shortest_path_to_bindings(graph1, "w3", 50.0, b, offset=5.0)
    assert backwards.to_dict() == {
        "dist": 2.0,
        "nodes": ["w3"],
        "start": ("w3", 3.0),
        "end": ("w3", 5.0),
        "binding": ("w3", (1.0, 3.0, obj1)),
    }
    assert forwards.to_dict() == {
        "dist": 31.0,
        "nodes": ["w3", "w4", "w6", "w7"],
        "start": ("w3", 5.0),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj2")),
    }


def test_shortest_bindings_direction_and_cutoff(graph1, bnd):
    b, obj1 = bnd
    backwards, forwards = shortest_path_to_bindings(
        graph1, "w3", 50.0, b, offset=5.0, direction=1
    )
    assert backwards is None and forwards is not None
    backwards, forwards = shortest_path_to_bindings(
        graph1, "w3", 50.0, b, offset=5.0, direction=-1
    )
    assert backwards is not None and forwards is None

    backwards, forwards = shortest_path_to_bindings(graph1, "w6", 50.0, b, direction=-1)
    assert forwards is None
    assert backwards.to_dict() == {
        "dist": 27.0,
        "nodes": ["w3", "w4", "w6"],
        "start": ("w3", 3.0),
        "end": ("w6", None),
        "binding": ("w3", (1.0, 3.0, obj1)),
    }

    backwards, _ = shortest_path_to_bindings(graph1, "w3", 2.0, b, offset=5.0)
    assert backwards is not None
    backwards, forwards = shortest_path_to_bindings(graph1, "w3", 2.0 - 1e-3, b, offset=5.0)
    assert backwards is None and forwards is None

    backwards, forwards = shortest_path_to_bindings(graph1, "w4", 30, b)
    assert forwards.to_dict() == {
        "dist": 6.0,
        "nodes": ["w4", "w6", "w7"],
        "start": ("w4", None),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj2")),
    }
    assert backwards.to_dict() == {
        "dist": 7.0,
        "nodes": ["w3", "w4"],
        "start": ("w3", 3.0),
        "end": ("w4", None),
        "binding": ("w3", (1.0, 3.0, obj1)),
    }

    d = distance_to_bindings(graph1, "w4", 30, b)
    assert d == (7.0, 6.0)


def test_shortest_bindings_first_popped_wins(graph1):
    # w7 backwards: w5 (dist 0, binding (8,8)) is the first-popped binding
    # node — its cost stands even though w2/w3 exist further out
    b = encode_bindings(
        graph1,
        {"w3": [(3, 8, "obj3")], "w2": [(2, 3, "obj4")], "w5": [(8, 8, "obj5")]},
    )
    backwards, forwards = shortest_path_to_bindings(graph1, "w7", 30, b)
    assert forwards is None
    assert backwards.to_dict() == {
        "dist": 7.0,
        "nodes": ["w5", "w7"],
        "start": ("w5", 8.0),
        "end": ("w7", None),
        "binding": ("w5", (8.0, 8.0, "obj5")),
    }


@pytest.fixture(scope="module")
def bnd3(graph1):
    return encode_bindings(
        graph1,
        {
            "w1": [(4, 4, "obj1")],
            "w3": [(1, 3, "obj31"), (5, 6, "obj32"), (9, 10, "obj33")],
            "w7": [(3, 4, "obj7")],
        },
    )


def test_all_paths_bindings_same_node(graph1, bnd3):
    backwards, forwards = all_paths_to_bindings(graph1, "w3", 30, bnd3, offset=5.5)
    assert len(backwards) == 1 and len(forwards) == 1
    assert backwards[0].to_dict() == {
        "dist": 2.5,
        "nodes": ["w3"],
        "start": ("w3", 3.0),
        "end": ("w3", 5.5),
        "binding": ("w3", (1.0, 3.0, "obj31")),
    }
    assert forwards[0].to_dict() == {
        "dist": 3.5,
        "nodes": ["w3"],
        "start": ("w3", 5.5),
        "end": ("w3", 9.0),
        "binding": ("w3", (9.0, 10.0, "obj33")),
    }


def test_all_paths_bindings_graph(graph1, bnd3):
    backwards, forwards = all_paths_to_bindings(graph1, "w4", 30, bnd3)
    assert len(forwards) == 1
    assert forwards[0].to_dict() == {
        "dist": 6.0,
        "nodes": ["w4", "w6", "w7"],
        "start": ("w4", None),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj7")),
    }
    assert len(backwards) == 1
    assert backwards[0].to_dict() == {
        "dist": 0.0,
        "nodes": ["w3", "w4"],
        "start": ("w3", 10.0),
        "end": ("w4", None),
        "binding": ("w3", (9.0, 10.0, "obj33")),
    }

    backwards, forwards = all_paths_to_bindings(graph1, "w7", 80, bnd3, offset=1.0)
    assert len(forwards) == 1
    assert forwards[0].to_dict() == {
        "dist": 2.0,
        "nodes": ["w7"],
        "start": ("w7", 1.0),
        "end": ("w7", 3.0),
        "binding": ("w7", (3.0, 4.0, "obj7")),
    }
    assert len(backwards) == 2
    assert backwards[0].to_dict() == {
        "dist": 24.0,
        "nodes": ["w3", "w4", "w6", "w7"],
        "start": ("w3", 10.0),
        "end": ("w7", 1.0),
        "binding": ("w3", (9.0, 10.0, "obj33")),
    }
    assert backwards[1].to_dict() == {
        "dist": 37.0,
        "nodes": ["w1", "w2", "w5", "w7"],
        "start": ("w1", 4.0),
        "end": ("w7", 1.0),
        "binding": ("w1", (4.0, 4.0, "obj1")),
    }

    backwards, forwards = all_paths_to_bindings(
        graph1, "w7", 80, bnd3, offset=1.0, direction=1
    )
    assert len(backwards) == 0 and len(forwards) == 1
    backwards, forwards = all_paths_to_bindings(
        graph1, "w7", 80, bnd3, offset=1.0, direction=-1
    )
    assert len(backwards) == 2 and len(forwards) == 0


def test_all_paths_bindings_with_endings(graph1, bnd3):
    _, forwards = all_paths_to_bindings(graph1, "w1", 4.0, bnd3, offset=9.0)
    assert len(forwards) == 1
    _, forwards = all_paths_to_bindings(
        graph1, "w1", 4.0, bnd3, offset=9.0, with_endings=True
    )
    assert len(forwards) == 2
    assert forwards[0].to_dict() == {
        "dist": 2.0,
        "nodes": ["w1", "w3"],
        "start": ("w1", 9.0),
        "end": ("w3", 1.0),
        "binding": ("w3", (1.0, 3.0, "obj31")),
    }
    assert forwards[1].to_dict() == {
        "dist": 4.0,
        "nodes": ["w1", "w2"],
        "start": ("w1", 9.0),
        "end": ("w2", 3.0),
        "binding": ("w2", (3.0, 3.0, None)),
    }

    backwards, forwards = all_paths_to_bindings(
        graph1, "w3", 5.0, bnd3, offset=0.5, with_endings=True
    )
    assert len(backwards) == 1
    assert backwards[0].to_dict() == {
        "dist": 5.0,
        "nodes": ["w1", "w3"],
        "start": ("w1", 5.5),
        "end": ("w3", 0.5),
        "binding": ("w1", (5.5, 5.5, None)),
    }
    assert len(forwards) == 1
    assert forwards[0].to_dict() == {
        "dist": 0.5,
        "nodes": ["w3"],
        "start": ("w3", 0.5),
        "end": ("w3", 1.0),
        "binding": ("w3", (1.0, 3.0, "obj31")),
    }

    backwards, forwards = all_paths_to_bindings(
        graph1, "w3", 5.0, bnd3, offset=2.5, with_endings=True
    )
    assert backwards[0].to_dict() == {
        "dist": 5.0,
        "nodes": ["w1", "w3"],
        "start": ("w1", 7.5),
        "end": ("w3", 2.5),
        "binding": ("w1", (7.5, 7.5, None)),
    }
    assert forwards[0].to_dict() == {
        "dist": 2.5,
        "nodes": ["w3"],
        "start": ("w3", 2.5),
        "end": ("w3", 5.0),
        "binding": ("w3", (5.0, 6.0, "obj32")),
    }


def test_all_paths_bindings_epsilon(graph1, bnd3):
    assert all_paths_to_bindings(graph1, "w3", 5.0, bnd3, offset=1)[1][0].binding == (
        "w3",
        (1.0, 3.0, "obj31"),
    )
    assert all_paths_to_bindings(graph1, "w3", 5.0, bnd3, offset=1 + 1e-15)[1][
        0
    ].binding == ("w3", (5.0, 6.0, "obj32"))


def test_all_paths_bindings_endings_suffix_filter(graph1, bnd3):
    expected = {
        "dist": 24.0,
        "nodes": ["w3", "w4", "w6", "w7"],
        "start": ("w3", 10.0),
        "end": ("w7", 1.0),
        "binding": ("w3", (9.0, 10.0, "obj33")),
    }
    backwards, forwards = all_paths_to_bindings(graph1, "w7", 30.0, bnd3, offset=1.0)
    assert len(backwards) == 1 and backwards[0].to_dict() == expected
    assert len(forwards) == 1
    backwards, forwards = all_paths_to_bindings(
        graph1, "w7", 30.0, bnd3, offset=1.0, with_endings=True
    )
    assert len(backwards) == 2
    assert backwards[0].to_dict() == expected
    assert backwards[1].to_dict() == {
        "dist": 30.0,
        "nodes": ["w2", "w5", "w7"],
        "start": ("w2", 1.0),
        "end": ("w7", 1.0),
        "binding": ("w2", (1.0, 1.0, None)),
    }
    assert len(forwards) == 1


def test_bindings_pairs_batched_equivalence(graph1, bnd):
    """The qid-batched kernel returns element-wise identical results to
    the single-query API across the golden case mix (plain, offsets,
    same-node fast path, over-cutoff, invalid source)."""
    from networkx_graph_spark.operators.bindings import (
        shortest_path_to_bindings_pairs,
    )

    b, _ = bnd
    queries = [
        ("w1", None),
        ("w3", None),
        ("w3", 1.0),          # same-node fast path
        ("w3", 1.0 + 1e-8),   # epsilon past the interval
        ("w3", 5.0),
        ("w4", None),
        ("w6", None),
        ("w7", None),
        ("nope", None),       # invalid source
    ]
    batched = shortest_path_to_bindings_pairs(graph1, queries, 50.0, b)
    assert len(batched) == len(queries)
    for (source, offset), (bwd_b, fwd_b) in zip(queries, batched):
        bwd_s, fwd_s = shortest_path_to_bindings(graph1, source, 50.0, b, offset=offset)
        for got, want in ((bwd_b, bwd_s), (fwd_b, fwd_s)):
            if want is None:
                assert got is None, (source, offset)
            else:
                assert got is not None and got.to_dict() == want.to_dict(), (
                    source, offset,
                )

    # tight cutoff + sinks through the batched path
    batched = shortest_path_to_bindings_pairs(
        graph1, [("w1", None), ("w3", 5.0)], 2.0, b, sinks=["w3"]
    )
    for (source, offset), (bwd_b, fwd_b) in zip([("w1", None), ("w3", 5.0)], batched):
        bwd_s, fwd_s = shortest_path_to_bindings(
            graph1, source, 2.0, b, offset=offset, sinks=["w3"]
        )
        assert (bwd_b is None) == (bwd_s is None)
        assert (fwd_b is None) == (fwd_s is None)
        if fwd_s is not None:
            assert fwd_b.to_dict() == fwd_s.to_dict()
        if bwd_s is not None:
            assert bwd_b.to_dict() == bwd_s.to_dict()

    # negative cutoff and empty batch edge cases
    assert shortest_path_to_bindings_pairs(graph1, queries[:2], -1.0, b) == [
        (None, None),
        (None, None),
    ]
    assert shortest_path_to_bindings_pairs(graph1, [], 10.0, b) == []
