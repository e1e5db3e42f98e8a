"""Dynamic node/edge attributes + a mutable build surface.

Reference parity: ``Node``/``Edge`` are ``py::dynamic_attr`` classes
(/root/reference/src/main.cpp:2279, :2324-2357) — arbitrary Python
attributes settable both attribute- and item-style, ``to_dict()`` returns
``{built-ins, **dynamic attrs}`` with *references* to the stored values
(mutating a returned list mutates the node), and the single built-in
``length`` is read-only after construction
(/root/reference/tests/test_basic.py:95-144).

``DiGraphBuilder`` mirrors the reference's mutable ``DiGraph`` build
surface (add_node/add_edge with attrs, ``G.nodes['w1'] is node`` identity)
and materializes to an immutable :class:`SparkDiGraph` whose vertices and
edges carry the SURVEY §1.7 ``attrs MAP<STRING,STRING>`` column — the
distributed, storage-only view of the same attributes (stringified;
algorithms never consult it, matching the reference where no kernel reads
dynamic attrs).
"""

from __future__ import annotations

from typing import Optional

from .indexer import Indexer
from .rounding import round_half_up, round_scale


class Node:
    """Node with built-in ``length`` + dynamic attrs
    (/root/reference/src/main.cpp:2279-2322)."""

    __slots__ = ("_length", "__dict__")

    def __init__(self, length: float = 1.0, **attrs):
        object.__setattr__(self, "_length", float(length))
        self.__dict__.update(attrs)

    @property
    def length(self) -> float:
        return self._length

    def __setattr__(self, key, value):
        if key == "length":
            raise AttributeError("length is read-only")
        self.__dict__[key] = value

    def __getitem__(self, key):
        if key == "length":
            return self._length
        return self.__dict__[key]

    def __setitem__(self, key, value):
        if key == "length":
            raise KeyError("length is read-only")
        self.__dict__[key] = value

    def to_dict(self) -> dict:
        # new dict, shared value references (reference semantics: mutating
        # a returned list mutates the node; adding keys does not)
        return {"length": self._length, **self.__dict__}


class Edge:
    """Weightless edge with dynamic attrs only
    (/root/reference/src/main.cpp:2324-2357)."""

    def __init__(self, **attrs):
        self.__dict__.update(attrs)

    def __getitem__(self, key):
        return self.__dict__[key]

    def __setitem__(self, key, value):
        self.__dict__[key] = value

    def to_dict(self) -> dict:
        return dict(self.__dict__)


class DiGraphBuilder:
    """Mutable add_node/add_edge surface; ``build(spark)`` freezes into a
    SparkDiGraph with attrs columns. Node ids follow the order-dependent
    Indexer rule; lengths round half-up at ingest; add_edge auto-creates
    endpoints with length 1.0 (/root/reference/src/main.cpp:366-389)."""

    def __init__(self, round_n: Optional[int] = 3):
        self.round_n = round_n
        self._scale = round_scale(round_n)
        self._indexer = Indexer()
        self.nodes: dict[str, Node] = {}
        self.edges: dict[tuple[str, str], Edge] = {}

    def add_node(self, name: str, length: float = 1.0, **attrs) -> Node:
        node = self.nodes.get(name)
        if node is None:
            self._indexer.id(name)
            node = Node(round_half_up(float(length), self._scale), **attrs)
            self.nodes[name] = node
        else:
            node.__dict__.update(attrs)
        return node

    def add_edge(self, a: str, b: str, **attrs) -> Edge:
        for endpoint in (a, b):
            if endpoint not in self.nodes:
                self.add_node(endpoint, 1.0)
        edge = self.edges.get((a, b))
        if edge is None:
            edge = Edge(**attrs)
            self.edges[(a, b)] = edge
        else:
            edge.__dict__.update(attrs)
        return edge

    def build(self, spark) -> "SparkDiGraph":
        from .graph import SparkDiGraph

        idx = self._indexer
        vrows = [
            (idx.get_id(name), name, node.length,
             {k: str(v) for k, v in node.__dict__.items()})
            for name, node in self.nodes.items()
        ]
        erows = [
            (idx.get_id(a), idx.get_id(b),
             {k: str(v) for k, v in edge.__dict__.items()})
            for (a, b), edge in self.edges.items()
        ]
        vdf = spark.createDataFrame(
            vrows, "id long, node string, length double, attrs map<string,string>"
        )
        edf = spark.createDataFrame(
            erows or [], "src long, dst long, attrs map<string,string>"
        )
        g = SparkDiGraph(spark, vdf, edf, round_n=self.round_n, indexer=idx)
        g.node_objs = dict(self.nodes)
        g.edge_objs = dict(self.edges)
        return g
