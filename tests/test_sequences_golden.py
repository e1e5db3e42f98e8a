"""Sequences search goldens (/root/reference/tests/test_basic.py:1463-1514)
— first-registered sequence wins under quick_return, zigzag paths search
their node lists the same way."""

from networkx_graph_spark.operators.linear import encode_sequences, search_for_seqs
from networkx_graph_spark.operators.sssp import shortest_path
from networkx_graph_spark.operators.zigzag import shortest_zigzag_path


def _hits(graph, path, seqs, quick_return=True):
    got = search_for_seqs(graph, path, seqs, quick_return=quick_return)
    return {i: [p.nodes for p in s] for i, s in got.items()}


def test_sequences_on_shortest_path(graph1):
    path = shortest_path(graph1, "w1", "w7", cutoff=37.0, source_offset=3.0)
    assert path.to_dict() == {
        "dist": 37.0,
        "nodes": ["w1", "w2", "w5", "w7"],
        "start": ("w1", 3.0),
        "end": ("w7", None),
    }
    seqs = encode_sequences(graph1, [["w2", "w5"], ["w2", "w5", "w7"]])
    assert _hits(graph1, path, seqs) == {1: [["w2", "w5"]]}
    assert _hits(graph1, path, seqs, quick_return=False) == {
        1: [["w2", "w5"], ["w2", "w5", "w7"]]
    }
    # registration order decides the quick_return winner
    seqs = encode_sequences(graph1, [["w2", "w5", "w7"], ["w2", "w5"]])
    assert _hits(graph1, path, seqs) == {1: [["w2", "w5", "w7"]]}
    assert _hits(graph1, path, seqs, quick_return=False) == {
        1: [["w2", "w5", "w7"], ["w2", "w5"]]
    }


def test_sequences_on_zigzag_path(graph1):
    path = shortest_zigzag_path(graph1, "w4", "w2", cutoff=30)
    assert path.to_dict() == {
        "dist": 10.0,
        "nodes": ["w4", "w3", "w2"],
        "directions": [-1, -1, 1],
    }
    seqs = encode_sequences(
        graph1, [["w2", "w7"], ["w3", "w2"], ["w3", "w2", "w7"]]
    )
    got = search_for_seqs(graph1, path, seqs)
    assert {i: [p.nodes for p in s] for i, s in got.items()} == {1: [["w3", "w2"]]}


def test_dynamic_path_attrs(graph1):
    path = shortest_zigzag_path(graph1, "w3", "w5", cutoff=15)
    path.extra_key = 42
    assert path.to_dict()["extra_key"] == 42
