"""networkx_graph_spark — PySpark-native link-graph analytics engine.

A from-scratch Spark reimplementation of the query semantics of
cubao/networkx-graph (reference at /root/reference, read-only), plus the
canonical web-link-graph suite (PageRank, connected components, label
propagation, triangle counting) and large-scale training-data pipeline
operators (dedup, similarity search, text analysis) — all DataFrame-first.
"""

from .graph import SparkDiGraph
from .indexer import Indexer, build_ids
from .rounding import clip, round_col, round_half_up, round_scale
from .session import get_spark

__all__ = [
    "SparkDiGraph",
    "Indexer",
    "build_ids",
    "get_spark",
    "round_half_up",
    "round_col",
    "round_scale",
    "clip",
]
__version__ = "0.1.0"
