"""Dynamic node/edge attribute goldens, transcribed from
/root/reference/tests/test_basic.py:93-144."""

import pytest

from networkx_graph_spark.attrs import DiGraphBuilder, Edge, Node


def test_node_dynamic_attrs():
    node = Node()
    assert node.length == 1.0
    node.key = 777
    assert node.__dict__ == {"key": 777}
    assert node.to_dict() == {"length": 1.0, "key": 777}
    node.key = [1, 2, 3]
    assert node["key"] == [1, 2, 3]
    node.key.append(5)
    assert node["key"] == [1, 2, 3, 5]
    assert node.to_dict() == {"length": 1.0, "key": [1, 2, 3, 5]}
    node.to_dict()["key"].extend([7, 9])
    assert node.to_dict() == {"length": 1.0, "key": [1, 2, 3, 5, 7, 9]}

    node.to_dict()["new_key"] = "value"
    assert list(node.to_dict().keys()) == ["length", "key"]

    node["key"] = "value"
    node["num"] = 42
    assert node.key == "value"
    assert node.num == 42
    node.key = 3.14
    assert node["key"] == 3.14
    node.num = 123
    assert node["num"] == 123

    with pytest.raises(AttributeError):
        node.length = 5
    with pytest.raises(KeyError):
        node["length"] = 5


def test_builder_nodes_edges_attrs():
    G1 = DiGraphBuilder()
    way1 = G1.add_node("way1", length=15.0)
    way2 = G1.add_node("way2", length=5.0, text="text", number=42, list=[4, 2])
    assert way1.length == 15.0
    assert way2.length == 5.0
    assert way2.text == "text"
    assert way2.number == 42
    assert way2.list == [4, 2]
    assert G1.nodes["way1"] is way1

    assert not G1.edges
    edge = G1.add_edge("way1", "way2")
    assert ("way1", "way2") in G1.edges
    assert G1.edges[("way1", "way2")] is edge

    edge["key"] = "value"
    assert edge.to_dict() == {"key": "value"}
    assert edge.key == "value"
    edge.to_dict()["new_key"] = "value"
    assert edge.__dict__ == {"key": "value"}

    assert isinstance(edge, Edge)


def test_builder_materializes_attrs_columns(spark):
    """The distributed view: vertices/edges carry MAP<STRING,STRING> attrs,
    and the built graph runs the normal operator surface."""
    from networkx_graph_spark.operators.sssp import shortest_path

    G = DiGraphBuilder()
    G.add_node("w1", length=10.0, kind="trunk")
    G.add_node("w2", length=15.0)
    G.add_edge("w1", "w2", bridge="yes")
    g = G.build(spark)
    v = {r["node"]: r for r in g.vertices.collect()}
    assert v["w1"]["attrs"] == {"kind": "trunk"} and v["w1"]["length"] == 10.0
    assert v["w2"]["attrs"] == {}
    e = g.edges.collect()[0]
    assert e["attrs"] == {"bridge": "yes"}
    # auto-created endpoints + indexer ids still reference-exact
    assert g.node_id("w1") == 1 and g.node_id("w2") == 2
    # operator surface unaffected by the extra column
    p = shortest_path(g, "w1", "w2", cutoff=50.0)
    assert p.nodes == ["w1", "w2"] and p.dist == 0.0
    g.unpersist()


def test_builder_auto_create_and_length_rounding(spark):
    G = DiGraphBuilder()
    G.add_node("a", length=5.0125)
    G.add_edge("a", "b")
    g = G.build(spark)
    lm = g.lengths_map
    assert lm[g.node_id("a")] == 5.013  # half-up at ingest
    assert lm[g.node_id("b")] == 1.0
    g.unpersist()
